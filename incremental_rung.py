#!/usr/bin/env python
"""500k-doc rung for x73 (incremental near-dup mining): measure the
daily-ingest claim with numbers — mining a new batch (the newest fifth of
doc ids, 100k docs) against the standing 400k corpus must (a) produce
EXACTLY the pairs of a full re-mine restricted to at-least-one-new, and
(b) cost less wall than the full re-mine, because candidate generation is
driven by the batch side and corpus x corpus candidates are never
generated.

Both sides run with the same ``max_band_width`` so candidate semantics
match (the 2M rung's matched-cap discipline); INC_RUNG_CAP selects it.
Expectation calibrated by measurement: at cap 100 the wall is dominated
by the union signature recompute that BOTH paths share (the
oracle-parity form recomputes corpus signatures; a deployment stores
them), so the saving is small; at cap 1000 the candidate volume is ~6x
and the skipped corpus x corpus share of it is what the incremental
plan never generates.  Writes an
"incremental_500k" block into SF10_RUNG.json (non-destructive merge) and
prints one JSON line.

Run: python incremental_rung.py   (requires testdata_sf10; sf10_rung.py
                                   builds it)
"""

from __future__ import annotations

import json
import os
import sys
import time

import sf10_rung

CAP = int(os.environ.get("INC_RUNG_CAP", "100"))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from conecta_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
    )
    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-incremental-rung",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf10_rung.SF10_DIR}/documents.parquet")
    n = docs.count()
    cut_row = docs.selectExpr(
        "percentile_disc(0.8) WITHIN GROUP (ORDER BY doc_id) AS cut"
    ).first()
    cut = int(cut_row["cut"])
    from pyspark.sql import functions as F

    new = docs.where(F.col("doc_id") >= cut)
    corpus = docs.where(F.col("doc_id") < cut)
    n_new = new.count()

    # full re-mine (two runs, keep the warm one), then filter to
    # at-least-one-new for the equality check
    full_runs, full_pairs = [], None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        full = minhash_lsh_pairs(docs, threshold=0.5, max_band_width=CAP)
        full_rows = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in full.collect()
        }
        full_runs.append(round(time.perf_counter() - t0, 3))
    full_pairs = len(full_rows)
    want = {p for p in full_rows if p[0] >= cut or p[1] >= cut}

    inc_runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        inc = incremental_minhash_pairs(
            corpus, new, threshold=0.5, max_band_width=CAP
        )
        inc_rows = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9)) for r in inc.collect()
        }
        inc_runs.append(round(time.perf_counter() - t0, 3))

    block = {
        "docs": n,
        "new_batch_docs": n_new,
        "cap": CAP,
        "full_mine_runs_sec": full_runs,
        "incremental_runs_sec": inc_runs,
        "full_pairs": full_pairs,
        "cross_or_new_pairs": len(want),
        "incremental_pairs": len(inc_rows),
        "pairs_equal_filtered_full": inc_rows == want,
        "speedup_warm": round(min(full_runs) / max(min(inc_runs), 1e-9), 2),
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
    rung.pop("incremental_500k", None)
    rung[f"incremental_500k_cap{CAP}"] = block
    with open(rung_path, "w") as f:
        json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "incremental_rung", **block}))


if __name__ == "__main__":
    main()
