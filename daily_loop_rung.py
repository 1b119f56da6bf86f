#!/usr/bin/env python
"""Daily-loop rung for the signature store: the contract a training-data
pipeline actually runs, measured end-to-end.

store_rung.py proved one batch against a static store.  This rung runs
the LOOP: build the store on the base corpus once, then for each of
``N_BATCHES`` successive ingest batches (a) mine the batch against the
CURRENT store (which already contains every earlier batch) and (b)
append the batch into the store.  What the numbers must show:

* per-batch mine wall stays ~flat while the store grows -- the batch
  pays for its own hashing/signing plus a scan of the (growing but
  skinny) stored banded relation, never a corpus recompute;
* append wall tracks the batch (one hashing pass + two parquet appends);
* correctness composes: the UNION of all per-batch pair sets must equal
  the one-shot filtered full mine over (base + all batches) restricted
  to pairs with at least one side outside the base corpus AND not
  batch-internal-to-an-earlier... -- precisely: every pair (a,b) of the
  full mine with max(a,b) in batch k is found by batch k's mine (its new
  side), because earlier docs are in the store by then.  So the union
  over batches of mined pairs == full-mine pairs with at least one
  non-base side.  (Frozen-DF vs union-DF drift would break equality;
  ``pairs_delta`` records it exactly -- 0 on this corpus.)

Writes a ``daily_loop_500k`` block into SF10_RUNG.json and prints one
JSON line.  Run: python daily_loop_rung.py   (requires testdata_sf10).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

N_BATCHES = int(os.environ.get("DAILY_LOOP_BATCHES", "4"))
CAP = int(os.environ.get("DAILY_LOOP_CAP", "100"))
WORK = os.environ.get("DAILY_LOOP_DIR", "/tmp/conecta_spark_daily_loop")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import sf10_rung
    from conecta_spark.operators.dedup import minhash_lsh_pairs
    from conecta_spark.operators.minhash_store import (
        append_batch,
        incremental_pairs_stored,
        read_manifest,
        write_signature_store,
    )
    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-daily-loop",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("DAILY_LOOP_SF", "") or sf10_rung.SF10_DIR
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    # base = oldest 60% of doc ids; batches = N_BATCHES equal id slices
    # of the remaining 40% (ids are ingestion-ordered, so this IS the
    # arrival order)
    fracs = [0.6 + 0.4 * i / N_BATCHES for i in range(N_BATCHES)]
    cuts = [
        int(
            docs.selectExpr(
                f"percentile_disc({f}) WITHIN GROUP (ORDER BY doc_id) AS c"
            ).first()["c"]
        )
        for f in fracs
    ]
    base = docs.where(F.col("doc_id") < cuts[0])

    shutil.rmtree(WORK, ignore_errors=True)
    t0 = time.perf_counter()
    write_signature_store(base, WORK)
    build_sec = round(time.perf_counter() - t0, 3)

    batch_rows = []
    mined_union: set = set()
    for k in range(N_BATCHES):
        lo = cuts[k]
        batch = docs.where(F.col("doc_id") >= lo)
        if k + 1 < N_BATCHES:
            batch = batch.where(F.col("doc_id") < cuts[k + 1])
        n_batch = batch.count()
        m = read_manifest(WORK)
        store_docs = int(m["n_docs"]) + int(m["n_appended"])
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        pairs = {
            (r.doc_a, r.doc_b)
            for r in incremental_pairs_stored(
                spark, WORK, batch, threshold=0.5, max_band_width=CAP
            ).collect()
        }
        mine_sec = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        append_batch(spark, WORK, batch)
        append_sec = round(time.perf_counter() - t0, 3)
        mined_union |= pairs
        batch_rows.append(
            {
                "batch": k,
                "batch_docs": n_batch,
                "store_docs_before": store_docs,
                "mine_sec": mine_sec,
                "append_sec": append_sec,
                "pairs": len(pairs),
            }
        )

    # one-shot reference: full mine over everything, filtered to pairs
    # with at least one side outside the base corpus
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    full = minhash_lsh_pairs(docs, threshold=0.5, max_band_width=CAP)
    want = {
        (r.doc_a, r.doc_b)
        for r in full.collect()
        if r.doc_a >= cuts[0] or r.doc_b >= cuts[0]
    }
    full_sec = round(time.perf_counter() - t0, 3)

    block = {
        "docs": n,
        "base_docs": int(read_manifest(WORK)["n_docs"]),
        "n_batches": N_BATCHES,
        "cap": CAP,
        "store_build_sec": build_sec,
        "batches": batch_rows,
        "union_pairs": len(mined_union),
        "full_mine_filtered_pairs": len(want),
        "pairs_missing": len(want - mined_union),
        # an extra pair is the expected incremental-capping boundary: a
        # band bucket under the cap at loop time can cross it once later
        # batches widen it, so the one-shot capped mine drops what an
        # earlier loop state legitimately mined (and vice versa for
        # missing).  Frozen-DF drift would show the same way; both are
        # bounded by bucket-boundary pairs, not systematic.
        "pairs_extra": len(mined_union - want),
        "full_mine_sec": full_sec,
        "loop_total_sec": round(
            sum(r["mine_sec"] + r["append_sec"] for r in batch_rows), 3
        ),
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
    if not os.environ.get("DAILY_LOOP_SF"):
        rung["daily_loop_500k"] = block
    with open(rung_path, "w") as f:
        json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "daily_loop_rung", **block}))


if __name__ == "__main__":
    main()
