#!/usr/bin/env python
"""Scale-growth measurement: does the LSH dedup family's WORK grow
linearly with corpus size?

A plan that looks right at sf0.1 can still hide superlinear work (the
classic failure: LSH candidate pairs growing quadratically inside dup
cohorts).  Wall time on a shared host is too noisy to prove scaling at
this corpus size, so the primary metrics here are deterministic work
counts -- band-bucket maxima, candidate pairs, verified pairs -- which are
exact functions of the data.  Time is reported as a secondary signal
(min of 3, steady state).

Corpus construction: the sf0.1 documents are replicated k times with id
offsets and a per-replica vowel rotation of the text.  Rotation changes
~2 of every 5 characters, so every 5-gram shingle differs across
replicas: each replica keeps the original's internal duplicate structure
but replicas never near-collide.  A scale-correct pipeline therefore does
exactly k times the 1x work; a bucket-degenerate one shows pair counts
growing faster than k.

Run: python scale_bench.py  (one JSON line to stdout).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


VOWELS = "aeiou"


def _rotations(k: int) -> list[str]:
    return [VOWELS[i % 5:] + VOWELS[: i % 5] for i in range(k)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from conecta_spark.session import get_session

    spark = get_session(
        app_name="conecta-spark-scale",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    work = tempfile.mkdtemp(prefix="scale_bench_")

    def build(k: int) -> str:
        path = f"{work}/docs_x{k}"
        rots = _rotations(k)
        rep = spark.range(k).select(F.col("id").alias("rep"))
        rot_text = F.col("text")
        for i, r in enumerate(rots):
            if i:
                rot_text = F.when(
                    F.col("rep") == i, F.translate(F.col("text"), VOWELS, r)
                ).otherwise(rot_text)
        (
            base.crossJoin(rep)
            .select(
                (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
                rot_text.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            .repartition(int(cpus))
            .write.mode("overwrite")
            .parquet(path)
        )
        return path

    from pyspark import StorageLevel

    from conecta_spark.operators import dedup

    def lsh_work(docs) -> dict:
        """Deterministic work counts of the x07 pipeline on ``docs``."""
        hashed = dedup.hashed_shingles(docs, 5, "text", "doc_id").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n = hashed.count()
        tok = hashed.select("doc_id", F.explode("sh").alias("h"))
        common = (
            tok.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 0.1 * n)
            .select("h")
        )
        common_arr = common.agg(F.collect_list("h").alias("common_hs"))
        filtered = (
            hashed.crossJoin(F.broadcast(common_arr))
            .select("doc_id", F.array_except("sh", "common_hs").alias("shf"))
            .where(F.size("shf") > 0)
        )
        sigs = dedup.minhash_signatures(filtered, 16, "doc_id")
        elems = ", ".join(
            f"element_at(mh, band_idx * 4 + {j + 1})" for j in range(4)
        )
        banded = sigs.select(
            "doc_id",
            F.explode(F.expr("sequence(0, 3)")).alias("band_idx"),
            "mh",
        ).select(
            "doc_id",
            "band_idx",
            F.expr(f"md5(concat_ws('-', {elems}))").alias("band_key"),
        )
        buckets = banded.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("c")
        )
        m = buckets.agg(
            F.max("c").alias("max_bucket"),
            F.sum(F.expr("c * (c - 1) / 2")).cast("long").alias("cand_pairs"),
        ).first()
        verified = dedup.minhash_lsh_pairs(docs).count()
        hashed.unpersist()
        return {
            "n_docs": n,
            "max_bucket": int(m["max_bucket"]),
            "cand_pairs": int(m["cand_pairs"]),
            "verified_pairs": verified,
        }

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _warm(batches):
        import numpy  # noqa: F401

        for b in batches:
            yield b

    run(spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(_warm, "id long"))

    results: dict[str, dict] = {}
    try:
        for k in (1, 2, 4):
            docs = spark.read.parquet(build(k))
            stats = lsh_work(docs)
            best = None
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                run(dedup.minhash_lsh_pairs(docs))
                best = min(best or 1e9, time.perf_counter() - t0)
            stats["lsh_seconds"] = round(best, 2)
            results[f"x{k}"] = stats
            print(f"x{k}: {stats}", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # -- semantic dedup (x54) growth: k centroids scaled with the corpus --
    #
    # Replicas are component ROTATIONS of the embedding vectors (roll by
    # rep*7 dims).  Rotation is an orthogonal transform, so every
    # in-replica dot product -- including the int8-quantized ones, since
    # quantization commutes with a permutation -- is bit-identical to the
    # base corpus, while cross-replica cosines scramble.  Ids interleave
    # (old*k + rep), so the first 8k ids are the 8 original centroid seeds
    # in every rotation: each replica carries its own rotated seed set and
    # reproduces the base assignment exactly.  Scaling k with the corpus
    # must therefore hold per-cell population ~constant: within-cell pair
    # work (the quadratic term) grows by k, not k^2.
    from conecta_spark.operators import simsearch

    emb_base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    semres: dict[str, dict] = {}
    work2 = tempfile.mkdtemp(prefix="scale_bench_emb_")
    try:
        for k in (1, 2, 4):
            rep = spark.range(k).select(F.col("id").alias("rep"))
            rolled = F.col("embedding")
            for i in range(1, k):
                r = (i * 7) % 64
                rolled = F.when(
                    F.col("rep") == i,
                    F.expr(
                        f"concat(slice(embedding, {r + 1}, {64 - r}), "
                        f"slice(embedding, 1, {r}))"
                    ),
                ).otherwise(rolled)
            path = f"{work2}/emb_x{k}"
            (
                emb_base.crossJoin(rep)
                .select(
                    (F.col("vec_id") * k + F.col("rep")).alias("vec_id"),
                    rolled.alias("embedding"),
                    "label",
                )
                .repartition(int(cpus))
                .write.mode("overwrite")
                .parquet(path)
            )
            docs = spark.read.parquet(path)
            cells = k * 8
            census = simsearch.centroid_assign(docs, k=cells).select(
                "centroid_id", "n_assigned"
            )
            c = census.agg(
                F.max("n_assigned").alias("max_cell"),
                F.sum(
                    F.expr("n_assigned * (n_assigned - 1) / 2")
                ).cast("long").alias("cell_pairs"),
                F.count(F.lit(1)).alias("cells_used"),
            ).first()
            dups = (
                simsearch.semantic_dedup(docs, k=cells)
                .agg(F.sum("is_dup"))
                .first()[0]
            )
            semres[f"x{k}"] = {
                "n_vecs": docs.count(),
                "cells_used": int(c["cells_used"]),
                "max_cell": int(c["max_cell"]),
                "cell_pairs": int(c["cell_pairs"]),
                "dups": int(dups),
            }
            print(f"semdedup x{k}: {semres[f'x{k}']}", file=sys.stderr)
    finally:
        shutil.rmtree(work2, ignore_errors=True)

    # -- edit-distance join (x66) blocking precision across scales --------
    #
    # Replicas carry a 3-char per-replica tag ("CusAAA#...") so
    # cross-replica name pairs sit at distance >= 3 > d=2: the TRUE
    # answer grows exactly k-fold.  The claim measured here is
    # output-sensitivity: candidate pairs from the pair-label prefix
    # blocking must track the verified answer (bounded cand/verified
    # overhead), not the square of a hot rare-gram cohort.  On the
    # id-dense serial-number corpus the true answer itself is
    # superlinear in corpus density -- which is why the factor compared
    # is candidates VS verified, not candidates vs k.
    from conecta_spark.operators import stringsim

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_custkey") <= 3000)  # dense serials make the TRUE
        # answer quadratic in corpus density; bound the base so the x4
        # sweep measures blocking precision, not raw output volume
        .select("c_custkey", "c_name")
    )
    edres: dict[str, dict] = {}
    tags = ["AAA", "BBB", "CCC", "DDD"]
    for k in (1, 2, 4):
        rep = spark.range(k).select(F.col("id").alias("rep"))
        tag = F.lit(tags[0])
        for i in range(1, k):
            tag = F.when(F.col("rep") == i, F.lit(tags[i])).otherwise(tag)
        corpus = cust.crossJoin(rep).select(
            (F.col("c_custkey") + F.col("rep") * 100_000_000).alias("id"),
            F.concat(
                F.lit("Cus"), tag, F.expr("substring(c_name, 9)")
            ).alias("s"),
        )
        _, cands = stringsim._qgram_candidates(corpus, "s", "id", 2, 2, None)
        n_cand = cands.count()
        verified = stringsim.edit_distance_join(
            corpus, "s", "id", threshold=2
        ).count()
        edres[f"x{k}"] = {
            "n_strings": corpus.count(),
            "cand_pairs": int(n_cand),
            "verified_pairs": int(verified),
            "cand_per_verified": round(n_cand / max(verified, 1), 2),
        }
        print(f"editjoin x{k}: {edres[f'x{k}']}", file=sys.stderr)

    r1, r4 = results["x1"], results["x4"]
    s1, s4 = semres["x1"], semres["x4"]
    out = {
        "metric": "scale_growth",
        "base_docs": n_base,
        "per_scale": results,
        "work_factor_x4": {
            "cand_pairs": round(r4["cand_pairs"] / max(r1["cand_pairs"], 1), 2),
            "verified_pairs": round(
                r4["verified_pairs"] / max(r1["verified_pairs"], 1), 2
            ),
            "max_bucket": round(r4["max_bucket"] / max(r1["max_bucket"], 1), 2),
        },
        "time_factor_x4": round(r4["lsh_seconds"] / r1["lsh_seconds"], 2),
        "semdedup_per_scale": semres,
        "semdedup_factor_x4": {
            "cell_pairs": round(s4["cell_pairs"] / max(s1["cell_pairs"], 1), 2),
            "max_cell": round(s4["max_cell"] / max(s1["max_cell"], 1), 2),
            "dups": round(s4["dups"] / max(s1["dups"], 1), 2),
        },
        "editjoin_per_scale": edres,
        "editjoin_factor_x4": {
            "cand_pairs": round(
                edres["x4"]["cand_pairs"]
                / max(edres["x1"]["cand_pairs"], 1),
                2,
            ),
            "verified_pairs": round(
                edres["x4"]["verified_pairs"]
                / max(edres["x1"]["verified_pairs"], 1),
                2,
            ),
            "cand_per_verified_x1_vs_x4": [
                edres["x1"]["cand_per_verified"],
                edres["x4"]["cand_per_verified"],
            ],
        },
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
