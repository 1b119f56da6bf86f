#!/usr/bin/env python
"""2M-doc rung for the persisted signature store (r11 verdict task 4):
the daily-ingest story at 4x the proven corpus.

The inline miner's cap-100 ladder is proven to 2M docs (SF10_RUNG
``mine_2m``), but the stored-incremental and compaction rungs stopped at
500k-1M.  This rung runs the WHOLE store lifecycle on the 2M corpus
(testdata_sf40, ids ingestion-ordered):

* base  = oldest 90% of ids (~1.8M docs) -> ``write_signature_store``;
* batch = ids in [90%, 95%) (~100k docs, the verdict's "100k batch
  mine") -> ``incremental_pairs_stored`` twice (cold/warm), pairs
  checked EXACTLY against the union-DF filtered full mine over
  base+batch (the x73/x77 invariant; frozen-DF deltas are counted);
* the batch is then APPENDED (O(batch) wall is the claim) and the store
  COMPACTED; a fixed probe (newest 5% of ids, ~100k docs) is mined
  before and after the compaction -- pairs must be exactly equal
  (compaction is purely physical) and the post-compaction read-side
  wall must not exceed the pre-compaction one.

Writes ``stored_incremental_2m`` and ``compaction_2m`` blocks into
SF10_RUNG.json (non-destructive merge) and prints one JSON line.

Run: python store2m_rung.py   (requires testdata_sf40; sf40_mine.py's
corpus builder writes it).  STORE2M_SF=/root/testdata/sf0.1 smokes the
flow without writing the artifact.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

CAP = int(os.environ.get("STORE2M_CAP", "100"))
WORK = os.environ.get("STORE2M_DIR", "/tmp/conecta_spark_store2m")
SF = os.environ.get("STORE2M_SF", "") or "/root/repo/testdata_sf40"


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from conecta_spark.operators.dedup import minhash_lsh_pairs
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
        app_name="conecta-spark-store2m",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    cuts = [
        int(
            docs.selectExpr(
                f"percentile_disc({f}) WITHIN GROUP (ORDER BY doc_id) AS c"
            ).first()["c"]
        )
        for f in (0.90, 0.95)
    ]
    base = docs.where(F.col("doc_id") < cuts[0])
    batch = docs.where(
        (F.col("doc_id") >= cuts[0]) & (F.col("doc_id") < cuts[1])
    )
    probe = docs.where(F.col("doc_id") >= cuts[1])
    n_batch, n_probe = batch.count(), probe.count()

    shutil.rmtree(WORK, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = write_signature_store(base, WORK)
    build_sec = round(time.perf_counter() - t0, 3)
    store_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(WORK)
        for f in fs
    )

    # one untimed warmup mine (fresh-session JVM/Janino warmup ~55 s at
    # the 500k rung would otherwise pollute the cold number)
    incremental_pairs_stored(
        spark, WORK, probe, threshold=0.5, max_band_width=CAP
    ).count()

    stored_runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        inc = incremental_pairs_stored(
            spark, WORK, batch, threshold=0.5, max_band_width=CAP
        )
        stored_rows = {(r.doc_a, r.doc_b) for r in inc.collect()}
        stored_runs.append(round(time.perf_counter() - t0, 3))

    # union-DF filtered full mine over base+batch, warm, invariant check
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    full = minhash_lsh_pairs(
        docs.where(F.col("doc_id") < cuts[1]),
        threshold=0.5,
        max_band_width=CAP,
    )
    want = {
        (r.doc_a, r.doc_b)
        for r in full.collect()
        if r.doc_a >= cuts[0] or r.doc_b >= cuts[0]
    }
    full_wall = round(time.perf_counter() - t0, 3)

    stored_block = {
        "docs": n,
        "corpus_docs": int(manifest["n_docs"]),
        "new_batch_docs": n_batch,
        "cap": CAP,
        "store_build_sec": build_sec,
        "store_bytes": store_bytes,
        "stored_batch_runs_sec": stored_runs,
        "full_mine_filtered_sec": full_wall,
        "stored_pairs": len(stored_rows),
        "filtered_full_pairs": len(want),
        "pairs_missing_vs_full": len(want - stored_rows),
        "pairs_extra_vs_full": len(stored_rows - want),
        "speedup_warm_vs_full": round(
            full_wall / max(min(stored_runs), 1e-9), 2
        ),
        "load_end": round(os.getloadavg()[0], 1),
    }
    print(json.dumps({"metric": "stored_incremental_2m", **stored_block}))

    # -- append + compact: O(batch) wall, flat read-side, pairs equal ----
    t0 = time.perf_counter()
    append_batch(spark, WORK, batch, batch_id="day-001")
    append_sec = round(time.perf_counter() - t0, 3)

    def probe_mine() -> tuple[float, set]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pairs = {
            (r.doc_a, r.doc_b)
            for r in incremental_pairs_stored(
                spark, WORK, probe, threshold=0.5, max_band_width=CAP
            ).collect()
        }
        return round(time.perf_counter() - t0, 3), pairs

    sec_before, pairs_before = probe_mine()
    t0 = time.perf_counter()
    m = compact_store(spark, WORK)
    compact_sec = round(time.perf_counter() - t0, 3)
    assert m["generation"] == 1 and not m["applied_batches"]
    sec_after, pairs_after = probe_mine()

    compact_block = {
        "docs": n,
        "base_docs": int(read_manifest(WORK)["n_docs"]),
        "appended_docs": n_batch,
        "probe_docs": n_probe,
        "cap": CAP,
        "append_sec": append_sec,
        "probe_mine_before_compact_sec": sec_before,
        "compact_sec": compact_sec,
        "probe_mine_after_compact_sec": sec_after,
        "pairs_before_compact": len(pairs_before),
        "pairs_after_compact": len(pairs_after),
        "pairs_equal": pairs_before == pairs_after,
        "load_end": round(os.getloadavg()[0], 1),
    }
    print(json.dumps({"metric": "compaction_2m", **compact_block}))

    rung_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SF10_RUNG.json"
    )
    try:
        with open(rung_path) as f:
            rung = json.load(f)
    except OSError:
        rung = {}
    if not os.environ.get("STORE2M_SF"):
        rung["stored_incremental_2m"] = stored_block
        rung["compaction_2m"] = compact_block
        with open(rung_path, "w") as f:
            json.dump(rung, f, indent=1)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
