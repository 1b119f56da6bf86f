#!/usr/bin/env python
"""The 1M-document mining rung (r8 verdict task 6): one more doubling of
the x07 MinHash+LSH corpus past SF10's 500k docs, into the regime where
peak single-box shuffle (~60 GB at 500k) approaches this machine's disk.

Corpus: testdata_sf10/documents.parquet replicated k=2 with a THIRD-level
decorrelator.  The remaining unused letters (jkqxyz) are too rare in the
synthetic text to decorrelate anything -- a rotation there would leave
every cross-replica twin sharing nearly all letter shingles, turning the
500k twin pairs into genuine near-dups and changing the operator's output
semantics.  Instead replica 1 applies the alphabet SWAP
ALPHA <-> ALPHA2 (sf1_rung "aeiousrtln" <-> sf10_rung "bcdfghmpvw"): a
bijective, self-inverse permutation that scrambles every token containing
any of the 20 frequent letters, and composes with the 100 level-1/2
rotations to 200 distinct permutations (the swap moves letters ACROSS the
two sets, so no composed permutation collides with a rotation-only one).
Digits additionally rotate by 1 in replica 1 (composes with the level-2
digit rotation bijectively).  doc_id offset 1e10 > the SF10 maximum.

Expected output: verified pairs ~= 2x SF10's 25,372 (linear scaling;
within-replica duplicate structure is preserved exactly, cross-replica
overlap vanishes).

Mining runs with ``max_band_width=1000`` (the r9 skew guard).  The first
1M attempt WITHOUT it died on disk: one sub-replica-common shingle
(document frequency 3.7%, far under the 10% DF filter) won the minhash
minimum for all four rows of band 0 under the swapped permutation and
collapsed a 37,340-doc bucket -- 2.0 BILLION raw candidate pairs (16x
the 500k corpus at 2x docs) whose verify-join shuffle filled the 77 GB
of free disk at stage 66 (sf20_stderr_died.log).  A bucket that wide is
a hash-collapse artifact, not similarity; the cap drops it and the
script also re-measures the 500k corpus WITH the cap as the recall
control (measured: 25,176 of 25,372 uncapped pairs = 99.2%, in a
mining pass 2x faster -- SF10's own 1k-4k-wide buckets were most of
its 122M raw candidates too).

Writes the result as a "mine_1m" block into SF10_RUNG.json (non-
destructive merge) and prints one JSON line.

Run: python sf20_mine.py            (builds corpus if absent, then mines)
     python sf20_mine.py --rebuild  (force corpus rebuild)
"""

from __future__ import annotations

import json
import os
import sys
import time

import sf1_rung
import sf10_rung

SF20_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "testdata_sf20"
)
OFF3 = 10_000_000_000
DIGITS = "0123456789"


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF20_DIR, exist_ok=True)
    docs = spark.read.parquet(f"{sf10_rung.SF10_DIR}/documents.parquet")
    rep = spark.range(2).select(F.col("id").alias("rep"))
    out = docs.crossJoin(rep).withColumn(
        "doc_id",
        (F.col("doc_id") + F.col("rep") * OFF3).cast(
            docs.schema["doc_id"].dataType.simpleString()
        ),
    )
    src = sf1_rung.ALPHA + sf10_rung.ALPHA2 + DIGITS
    dst = sf10_rung.ALPHA2 + sf1_rung.ALPHA + DIGITS[1:] + DIGITS[:1]
    out = out.withColumn(
        "text",
        F.when(
            F.col("rep") == 1, F.translate(F.col("text"), src, dst)
        ).otherwise(F.col("text")),
    )
    (
        out.drop("rep")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(f"{SF20_DIR}/documents.parquet")
    )


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf10_rung._clean_stale_spark_tmp()

    from conecta_spark.queries import REGISTRY, _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-sf20-mine",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    marker = os.path.join(SF20_DIR, "documents.parquet", "_SUCCESS")
    if "--rebuild" in sys.argv or not os.path.exists(marker):
        t0 = time.perf_counter()
        build(spark)
        print(
            f"built SF20 documents in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    from conecta_spark.operators.dedup import minhash_lsh_pairs

    CAP = 1000

    n_docs = spark.read.parquet(f"{SF20_DIR}/documents.parquet").count()
    print(f"docs: {n_docs}", file=sys.stderr)

    # Recall control: the 500k corpus (where no artifact bucket exists --
    # max family 3,916) mined WITH the cap must reproduce the r7/r8
    # uncapped answer of 25,372 verified pairs.
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    sf10_docs = spark.read.parquet(
        f"{sf10_rung.SF10_DIR}/documents.parquet"
    )
    sf10_capped = minhash_lsh_pairs(
        sf10_docs, threshold=0.5, max_band_width=CAP
    ).count()
    sf10_capped_sec = round(time.perf_counter() - t0, 3)
    print(
        f"sf10 capped: pairs={sf10_capped} ({sf10_capped_sec}s) "
        f"vs 25372 uncapped",
        file=sys.stderr,
    )

    runs = []
    n_pairs = None
    for i in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        docs = spark.read.parquet(f"{SF20_DIR}/documents.parquet")
        out = minhash_lsh_pairs(docs, threshold=0.5, max_band_width=CAP)
        n_pairs = out.count()
        runs.append(round(time.perf_counter() - t0, 3))
        print(f"x07 run {i}: {runs[-1]}s pairs={n_pairs}", file=sys.stderr)

    block = {
        "docs": n_docs,
        "max_band_width": CAP,
        "x07_runs_sec": runs,
        "pairs": n_pairs,
        "pairs_vs_sf10": round(n_pairs / 25372, 3),
        "sf10_capped_pairs": sf10_capped,
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
    rung["mine_1m"] = block
    with open(rung_path, "w") as f:
        json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "sf20_mine", **block}))


if __name__ == "__main__":
    main()
