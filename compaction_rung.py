#!/usr/bin/env python
"""Compaction rung for the signature store: read-side wall must stay
flat as daily appends accumulate, and compaction must not change pairs.

daily_loop_rung.py proved the mine+append loop; what it leaves open is
RETENTION: append_batch adds one directory per batch and every read
unions base + N batch dirs, so a store that ingests daily pays growing
file-listing/footer/small-file overhead until compact_store folds the
batches into one well-partitioned relation per store.  This rung builds
the store on the oldest 60% of the SF10 corpus, appends ``N_BATCHES``
(default 10) successive id-slices covering the next 36%, and mines one
FIXED probe batch (the newest 4%) against the store at 1, N/2, and N
batch dirs, then compacts and mines the probe again.  What the numbers
must show:

* probe-mine wall after compaction <= the N-batch-dir wall (read-side
  cost folded flat) while pair sets are EXACTLY equal (compaction is
  purely physical);
* compaction wall is one bounded rewrite (two repartitioned parquet
  writes), amortized over every subsequent daily read.

Writes a ``compaction_500k`` block into SF10_RUNG.json and prints one
JSON line.  Run: python compaction_rung.py   (requires testdata_sf10;
COMPACTION_SF=/root/testdata/sf0.1 smokes without writing the artifact).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

N_BATCHES = int(os.environ.get("COMPACTION_BATCHES", "10"))
CAP = int(os.environ.get("COMPACTION_CAP", "100"))
WORK = os.environ.get("COMPACTION_DIR", "/tmp/conecta_spark_compaction")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import sf10_rung
    from conecta_spark.operators.minhash_store import (
        append_batch,
        compact_store,
        incremental_pairs_stored,
        read_manifest,
        write_signature_store,
    )
    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-compaction",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("COMPACTION_SF", "") or sf10_rung.SF10_DIR
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # base = oldest 60% of ids; N_BATCHES slices over the next 36%;
    # probe = the newest 4% (ids are ingestion-ordered) -- the probe is
    # FIXED so every timed mine does identical batch-side work and the
    # only variable is the store's physical layout
    fracs = [0.6 + 0.36 * i / N_BATCHES for i in range(N_BATCHES)] + [0.96]
    cuts = [
        int(
            docs.selectExpr(
                f"percentile_disc({f}) WITHIN GROUP (ORDER BY doc_id) AS c"
            ).first()["c"]
        )
        for f in fracs
    ]
    base = docs.where(F.col("doc_id") < cuts[0])
    probe = docs.where(F.col("doc_id") >= cuts[-1])
    n_probe = probe.count()

    def timed_probe_mine() -> tuple[float, set]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pairs = {
            (r.doc_a, r.doc_b)
            for r in incremental_pairs_stored(
                spark, WORK, probe, threshold=0.5, max_band_width=CAP
            ).collect()
        }
        return round(time.perf_counter() - t0, 3), pairs

    shutil.rmtree(WORK, ignore_errors=True)
    t0 = time.perf_counter()
    write_signature_store(base, WORK)
    build_sec = round(time.perf_counter() - t0, 3)

    # one UNTIMED probe mine first: the initial mine in a fresh session
    # pays JVM/Janino codegen warmup (~55 s at this scale), which would
    # otherwise dominate the 1-dir point and make the series read as
    # decreasing; the rung measures store LAYOUT cost, not warmup
    timed_probe_mine()

    mine_points = []
    append_total = 0.0
    checkpoints = {1, max(1, N_BATCHES // 2), N_BATCHES}
    for k in range(N_BATCHES):
        batch = docs.where(
            (F.col("doc_id") >= cuts[k]) & (F.col("doc_id") < cuts[k + 1])
        )
        t0 = time.perf_counter()
        append_batch(spark, WORK, batch, batch_id=f"day-{k:03d}")
        append_total += time.perf_counter() - t0
        if k + 1 in checkpoints:
            sec, pairs = timed_probe_mine()
            mine_points.append(
                {"batch_dirs": k + 1, "mine_sec": sec, "pairs": len(pairs)}
            )
    pairs_before = pairs  # at N_BATCHES dirs

    t0 = time.perf_counter()
    m = compact_store(spark, WORK)
    compact_sec = round(time.perf_counter() - t0, 3)
    assert m["generation"] == 1 and not m["applied_batches"]

    sec_after, pairs_after = timed_probe_mine()

    block = {
        "docs": n,
        "base_docs": int(read_manifest(WORK)["n_docs"]),
        "probe_docs": n_probe,
        "n_batches": N_BATCHES,
        "cap": CAP,
        "store_build_sec": build_sec,
        "append_total_sec": round(append_total, 3),
        "probe_mine_by_batch_dirs": mine_points,
        "compact_sec": compact_sec,
        "probe_mine_after_compact_sec": sec_after,
        "pairs_before_compact": len(pairs_before),
        "pairs_after_compact": len(pairs_after),
        "pairs_equal": pairs_before == pairs_after,
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
    if not os.environ.get("COMPACTION_SF"):
        rung["compaction_500k"] = block
        with open(rung_path, "w") as f:
            json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "compaction_rung", **block}))


if __name__ == "__main__":
    main()
