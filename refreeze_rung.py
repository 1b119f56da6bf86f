#!/usr/bin/env python
"""Refreeze rung for the signature store (r11 verdict task 3): the
drift half of the lifecycle, measured.

The DF table freezes at build; the r11 guidance for drift was a full
store REBUILD -- an O(corpus) re-shingle of raw text.  ``refreeze_common``
recomputes the DF table and re-bands from the STORED shingle relation,
skipping the text pass.  This rung builds the store on the oldest 60%
of the SF10 corpus, appends the next 20% as one batch, then:

* times ``refreeze_common`` on the store;
* times the rebuild baseline (``write_signature_store`` over the same
  80% corpus into a fresh path -- what the old guidance cost);
* mines the newest 20% against BOTH stores: pair sets must be exactly
  equal (refreeze == rebuild semantically), and ``refreeze_sec`` must
  come in under ``rebuild_sec`` (the whole point: signing is cheaper
  than shingling);
* asserts the drift clock reset (n_appended == 0, n_docs == 80% count).

Writes a ``refreeze_500k`` block into SF10_RUNG.json and prints one
JSON line.  Run: python refreeze_rung.py   (requires testdata_sf10;
REFREEZE_SF=/root/testdata/sf0.1 smokes without writing the artifact).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

CAP = int(os.environ.get("REFREEZE_CAP", "100"))
WORK = os.environ.get("REFREEZE_DIR", "/tmp/conecta_spark_refreeze")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import sf10_rung
    from conecta_spark.operators.minhash_store import (
        append_batch,
        incremental_pairs_stored,
        read_manifest,
        refreeze_common,
        write_signature_store,
    )
    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-refreeze",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("REFREEZE_SF", "") or sf10_rung.SF10_DIR
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    cuts = [
        int(
            docs.selectExpr(
                f"percentile_disc({f}) WITHIN GROUP (ORDER BY doc_id) AS c"
            ).first()["c"]
        )
        for f in (0.6, 0.8)
    ]
    base = docs.where(F.col("doc_id") < cuts[0])
    day1 = docs.where(
        (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
    )
    probe = docs.where(F.col("doc_id") >= cuts[1])
    corpus80 = docs.where(F.col("doc_id") < cuts[1])

    shutil.rmtree(WORK, ignore_errors=True)
    refrozen = os.path.join(WORK, "refrozen")
    rebuilt = os.path.join(WORK, "rebuilt")

    t0 = time.perf_counter()
    write_signature_store(base, refrozen)
    build_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    append_batch(spark, refrozen, day1, batch_id="day-001")
    append_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    m = refreeze_common(spark, refrozen)
    refreeze_sec = round(time.perf_counter() - t0, 3)
    assert m["n_appended"] == 0 and m["common_generation"] == 1

    # rebuild baseline: what the pre-refreeze drift guidance cost
    t0 = time.perf_counter()
    m_rebuilt = write_signature_store(corpus80, rebuilt)
    rebuild_sec = round(time.perf_counter() - t0, 3)
    assert m["n_docs"] == m_rebuilt["n_docs"]

    def mine(path: str) -> tuple[float, set]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pairs = {
            (r.doc_a, r.doc_b)
            for r in incremental_pairs_stored(
                spark, path, probe, threshold=0.5, max_band_width=CAP
            ).collect()
        }
        return round(time.perf_counter() - t0, 3), pairs

    # untimed warmup (fresh-session JVM/Janino warmup)
    mine(refrozen)
    sec_refrozen, pairs_refrozen = mine(refrozen)
    sec_rebuilt, pairs_rebuilt = mine(rebuilt)

    block = {
        "docs": n,
        "base_docs": int(base.count()),
        "appended_docs": int(day1.count()),
        "refrozen_n_docs": int(m["n_docs"]),
        "cap": CAP,
        "store_build_sec": build_sec,
        "append_sec": append_sec,
        "refreeze_sec": refreeze_sec,
        "rebuild_sec": rebuild_sec,
        "refreeze_vs_rebuild": round(
            rebuild_sec / max(refreeze_sec, 1e-9), 2
        ),
        "probe_mine_refrozen_sec": sec_refrozen,
        "probe_mine_rebuilt_sec": sec_rebuilt,
        "pairs_refrozen": len(pairs_refrozen),
        "pairs_rebuilt": len(pairs_rebuilt),
        "pairs_equal": pairs_refrozen == pairs_rebuilt,
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
    if not os.environ.get("REFREEZE_SF"):
        rung["refreeze_500k"] = block
        with open(rung_path, "w") as f:
            json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "refreeze_rung", **block}))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
