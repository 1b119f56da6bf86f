#!/usr/bin/env python
"""The 2M-document mining rung: a further doubling of the x07 MinHash+LSH
corpus past the 1M rung (sf20_mine.py) -- and the rung where the single
box's disk ceiling was actually HIT, measured, and explained.

Corpus: testdata_sf20/documents.parquet replicated k=2 with a FOURTH-level
decorrelator.  Levels 1/2 rotate within the two disjoint frequent-letter
alphabets (sf1 "aeiousrtln", sf10 "bcdfghmpvw"); level 3 SWAPS the
alphabets.  Level 4 must avoid a trap the first attempt (a 20-cycle
across the concatenated alphabet) fell into: the corpus VOCABULARY is
closed under alphabet rotations BY CONSTRUCTION (rotations are exactly
how levels 1/2 made replicas), and the 20-cycle acts identically to
"rotate ALPHA by 1" on every token avoiding the boundary letter 'n' --
so the "decorrelated" twin of most text coincided with an existing
rotation replica and the 2M corpus gained ~200k GENUINE cross-replica
near-dup pairs (measured: pair growth 6.16x instead of ~2x; the miner
was right, the corpus was wrong).  The shipped level 4 is a NON-AFFINE
derangement within each alphabet -- ALPHA[i] -> ALPHA[(3i+1) % 10],
ALPHA2[i] -> ALPHA2[(7i+3) % 10], digits d -> (3d+1) % 10 -- which
cannot agree with any rotation on a shingle containing two ALPHA
letters i != j unless 2(i-j) = 0 (mod 10) (only conjugate pairs i,
i+5), and cannot agree with any swap-composed map at all (it preserves
each alphabet).  Residual coincidences are confined to shingles whose
frequent letters all sit in one conjugate pair -- negligible, and the
measured growth below confirms it.  doc_id offset 1e11 > the 1M
maximum (~1.05e10).

THE MEASURED CEILING (first attempt, max_band_width=1000): died with
"No space left on device" in the candidate stage with 76 GB free at
start.  The bucket-width probe (recomputed below into the artifact)
quantifies why: uncapped raw candidates at 2M docs = 7.9e9 (widest
bucket 74,263 docs); cap 1000 still leaves 1.32e8 candidate pairs, and
the exact-verification join's INTERMEDIATE relation -- (pair, sh_a)
rows carrying a ~2.2 KB shingle array through the second shuffle -- is
then ~290 GB, 4x the free disk.  The quadratic-within-family growth is
structural: a template family of width w contributes w(w-1)/2
candidates and doubles its w with every corpus doubling, so candidates
from under-cap families grow ~4x per doubling while verified pairs grow
~2x.  On a cluster this is a non-event (shuffle disk scales with
executors, and the per-family width is capped by max_band_width
regardless of corpus size); on one box the control is a corpus-scaled
cap.  With cap 100 the candidate volume is 2.3e7 (~50 GB intermediate)
and the full ladder below completes -- the recall price is measured at
every rung rather than assumed.

What this script records (mine_2m block in SF10_RUNG.json):
* the bucket-width probe (uncapped/capped candidate volumes),
* the cap-1000 failure with the resource named and sized,
* a matched-semantics cap-100 ladder: 500k / 1M / 2M docs mined with
  the SAME cap, so the pair-growth exponent is comparable across rungs
  (the 1M rung's published 49,190 pairs used cap 1000 -- different
  candidate semantics, not directly comparable).

Run: python sf40_mine.py            (builds corpora if absent, then mines)
     python sf40_mine.py --rebuild  (force corpus rebuild)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import sf1_rung
import sf10_rung
import sf20_mine

SF40_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "testdata_sf40"
)
OFF4 = 100_000_000_000
DIGITS = "0123456789"
CAP = 100


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF40_DIR, exist_ok=True)
    docs = spark.read.parquet(f"{sf20_mine.SF20_DIR}/documents.parquet")
    rep = spark.range(2).select(F.col("id").alias("rep"))
    out = docs.crossJoin(rep).withColumn(
        "doc_id",
        (F.col("doc_id") + F.col("rep") * OFF4).cast(
            docs.schema["doc_id"].dataType.simpleString()
        ),
    )
    a1, a2 = sf1_rung.ALPHA, sf10_rung.ALPHA2
    src = a1 + a2 + DIGITS
    dst = (
        "".join(a1[(3 * i + 1) % 10] for i in range(10))
        + "".join(a2[(7 * i + 3) % 10] for i in range(10))
        + "".join(DIGITS[(3 * d + 1) % 10] for d in range(10))
    )
    out = out.withColumn(
        "text",
        F.when(
            F.col("rep") == 1, F.translate(F.col("text"), src, dst)
        ).otherwise(F.col("text")),
    )
    (
        out.drop("rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SF40_DIR}/documents.parquet")
    )


def _free_gb(path: str = "/tmp") -> float:
    return round(shutil.disk_usage(path).free / 2**30, 1)


def _bucket_probe(spark, docs) -> dict:
    """Candidate-volume probe -- the library operator
    (conecta_spark.operators.dedup.minhash_candidate_probe, registry
    x74), called with this rung's cap choices.  It prices every cap for
    the cost of one aggregation, no pairs generated."""
    from conecta_spark.operators.dedup import minhash_candidate_probe

    row = minhash_candidate_probe(docs, caps=(CAP, 1000)).first().asDict()
    return {k: int(v) for k, v in row.items()}


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf10_rung._clean_stale_spark_tmp()

    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-sf40-mine",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    marker20 = os.path.join(
        sf20_mine.SF20_DIR, "documents.parquet", "_SUCCESS"
    )
    if not os.path.exists(marker20):
        t0 = time.perf_counter()
        sf20_mine.build(spark)
        print(
            f"built SF20 documents in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    marker = os.path.join(SF40_DIR, "documents.parquet", "_SUCCESS")
    if "--rebuild" in sys.argv or not os.path.exists(marker):
        t0 = time.perf_counter()
        build(spark)
        print(
            f"built SF40 documents in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    from conecta_spark.operators.dedup import minhash_lsh_pairs

    docs_2m = spark.read.parquet(f"{SF40_DIR}/documents.parquet")
    n_docs = docs_2m.count()
    disk_before = _free_gb()
    print(f"docs: {n_docs}; free disk {disk_before} GB", file=sys.stderr)

    probe = _bucket_probe(spark, docs_2m)
    print(f"bucket probe: {probe}", file=sys.stderr)

    # matched-semantics cap ladder: same cap at every rung so pair growth
    # is comparable
    ladder = {}
    for label, path in (
        ("500k", f"{sf10_rung.SF10_DIR}/documents.parquet"),
        ("1m", f"{sf20_mine.SF20_DIR}/documents.parquet"),
        ("2m", f"{SF40_DIR}/documents.parquet"),
    ):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = minhash_lsh_pairs(
            spark.read.parquet(path), threshold=0.5, max_band_width=CAP
        )
        pairs = out.count()
        sec = round(time.perf_counter() - t0, 3)
        ladder[label] = {
            "pairs": pairs,
            "sec": sec,
            "disk_free_gb_after": _free_gb(),
        }
        print(f"cap{CAP} {label}: {ladder[label]}", file=sys.stderr)

    block = {
        "docs": n_docs,
        "bucket_probe": probe,
        "cap1000_failure": {
            "outcome": "No space left on device (candidate/verify stage)",
            "disk_free_gb_at_start": 76.1,
            "raw_cap1000_pairs": probe.get("raw_cap1000"),
            "verify_intermediate_est_gb": round(
                probe.get("raw_cap1000", 0) * 2.2e3 / 2**30, 1
            ),
            "why": "verify join's (pair, shingle-array) intermediate; "
            "under-cap template families double their width per corpus "
            "doubling, so candidates grow ~4x per doubling",
        },
        "cap": CAP,
        "ladder": ladder,
        "pairs_growth_1m_over_500k": round(
            ladder["1m"]["pairs"] / max(ladder["500k"]["pairs"], 1), 3
        ),
        "pairs_growth_2m_over_1m": round(
            ladder["2m"]["pairs"] / max(ladder["1m"]["pairs"], 1), 3
        ),
        "sf10_cap1000_pairs": 25176,
        "sf10_uncapped_pairs": 25372,
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
    rung["mine_2m"] = block
    with open(rung_path, "w") as f:
        json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "sf40_mine", **block}))


if __name__ == "__main__":
    main()
