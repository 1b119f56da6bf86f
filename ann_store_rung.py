#!/usr/bin/env python
"""Persisted-ANN-index rung (r11 verdict task 6): the IVF store at the
200k-vector SF10 corpus.

x42/x14's in-memory IVF rebuilds centroids + assignments per session;
the ANN store (operators/ann_store.py) persists them once.  This rung
measures the lifecycle on testdata_sf10's embeddings (200k isotropic
64-dim vectors, 256 cells / 96 probes -- the recall>=0.9 operating
point from the ``ann`` block):

* ``store_build_sec`` -- one-time quantizer train + assignment write;
* ``append_sec`` -- newest 20% of vec_ids assigned against the STORED
  centroids (O(batch): no retrain, no corpus rescan);
* ``search_warm_sec`` -- the x14 acceptance panel against the stored
  relation (the steady-state daily cost);
* ``rebuild_plus_search_sec`` -- what the same search costs when the
  index must be rebuilt in memory first (the pre-store world);
* ``results_equal_in_memory`` -- stored search row-for-row equal to the
  in-memory engine over base-index + batch assigned with the same
  stored centroids (the frozen-centroid twin);
* ``recluster_sec`` vs ``rebuild_store_sec`` -- the drift half:
  ``recluster_ann_store`` retrains + re-assigns FROM THE STORED VECTORS
  while the rebuild baseline re-reads the source embeddings; at this
  rung both read similar bytes (the source table IS basically (id,
  vector)), so the claim measured is parity-or-better cost with ZERO
  source access, plus ``reclustered_equals_fresh`` -- the reclustered
  store's search row-for-row equal to a store freshly built over the
  full corpus (the bit-identity contract, here proven at 200k).

Writes an ``ann_store_200k`` block into SF10_RUNG.json and prints one
JSON line.  Run: python ann_store_rung.py   (requires testdata_sf10;
ANN_STORE_SF=/root/testdata/sf0.1 smokes without writing the artifact).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

N_CELLS = int(os.environ.get("ANN_STORE_CELLS", "256"))
N_PROBE = int(os.environ.get("ANN_STORE_PROBE", "96"))
WORK = os.environ.get("ANN_STORE_DIR", "/tmp/conecta_spark_ann_rung")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import sf10_rung
    from conecta_spark.operators.ann_store import (
        ann_store_search,
        append_ann_batch,
        read_ann_manifest,
        recluster_ann_store,
        write_ann_store,
    )
    from conecta_spark.operators.simsearch import (
        ANN_QUERY_IDS,
        IVFIndex,
        assign_cells,
        build_ivf_index,
        ivf_search_batch,
    )
    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-ann-store",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("ANN_STORE_SF", "") or sf10_rung.SF10_DIR
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    cut = int(
        emb.selectExpr(
            "percentile_disc(0.8) WITHIN GROUP (ORDER BY vec_id) AS c"
        ).first()["c"]
    )
    base = emb.where(F.col("vec_id") < cut)
    batch = emb.where(F.col("vec_id") >= cut)
    n_batch = batch.count()

    shutil.rmtree(WORK, ignore_errors=True)
    t0 = time.perf_counter()
    write_ann_store(base, WORK, n_clusters=N_CELLS)
    build_sec = round(time.perf_counter() - t0, 3)
    store_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(WORK)
        for f in fs
    )

    t0 = time.perf_counter()
    append_ann_batch(spark, WORK, batch, batch_id="day-001")
    append_sec = round(time.perf_counter() - t0, 3)
    m = read_ann_manifest(WORK)
    assert m["n_appended"] == n_batch

    def rows(df) -> set:
        return {
            (r.query_id, r.vec_id, r.score, r.rank)
            for r in df.select(
                "query_id", "vec_id", "score", "rank"
            ).collect()
        }

    # untimed warmup search (JVM/codegen), then two timed
    rows(
        ann_store_search(spark, WORK, ANN_QUERY_IDS, k=10, n_probe=N_PROBE)
    )
    search_runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        stored_rows = rows(
            ann_store_search(
                spark, WORK, ANN_QUERY_IDS, k=10, n_probe=N_PROBE
            )
        )
        search_runs.append(round(time.perf_counter() - t0, 3))

    # the pre-store world: rebuild the in-memory index, then search
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    index = build_ivf_index(base, n_clusters=N_CELLS)
    new_vecs = batch.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    twin = IVFIndex(
        index.assigned.unionByName(
            assign_cells(new_vecs, index.centers, "vec_id")
        ),
        index.centers,
        "vec_id",
    )
    mem_rows = rows(
        ivf_search_batch(twin, ANN_QUERY_IDS, k=10, n_probe=N_PROBE)
    )
    rebuild_plus_search = round(time.perf_counter() - t0, 3)
    index.unpersist()

    # the drift half: recluster from the STORE vs rebuild from SOURCE
    t0 = time.perf_counter()
    m2 = recluster_ann_store(spark, WORK)
    recluster_sec = round(time.perf_counter() - t0, 3)
    assert m2["n_appended"] == 0 and m2["n_vecs"] == n

    fresh = WORK + "_fresh"
    shutil.rmtree(fresh, ignore_errors=True)
    t0 = time.perf_counter()
    write_ann_store(emb, fresh, n_clusters=N_CELLS)
    rebuild_store_sec = round(time.perf_counter() - t0, 3)
    reclustered_rows = rows(
        ann_store_search(spark, WORK, ANN_QUERY_IDS, k=10, n_probe=N_PROBE)
    )
    fresh_rows = rows(
        ann_store_search(spark, fresh, ANN_QUERY_IDS, k=10, n_probe=N_PROBE)
    )
    shutil.rmtree(fresh, ignore_errors=True)

    block = {
        "vectors": n,
        "base_vectors": int(m["n_vecs"]),
        "batch_vectors": n_batch,
        "n_cells": N_CELLS,
        "n_probe": N_PROBE,
        "store_build_sec": build_sec,
        "store_bytes": store_bytes,
        "append_sec": append_sec,
        "search_warm_runs_sec": search_runs,
        "rebuild_plus_search_sec": rebuild_plus_search,
        "speedup_vs_rebuild": round(
            rebuild_plus_search / max(min(search_runs), 1e-9), 2
        ),
        "result_rows": len(stored_rows),
        "results_equal_in_memory": stored_rows == mem_rows,
        "recluster_sec": recluster_sec,
        "rebuild_store_sec": rebuild_store_sec,
        "reclustered_equals_fresh": reclustered_rows == fresh_rows,
        "load_end": round(os.getloadavg()[0], 1),
    }
    rung_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SF10_RUNG.json"
    )
    try:
        with open(rung_path) as f:
            rung = json.load(f)
    except OSError:
        rung = {}
    if not os.environ.get("ANN_STORE_SF"):
        rung["ann_store_200k"] = block
        with open(rung_path, "w") as f:
            json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "ann_store_rung", **block}))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
