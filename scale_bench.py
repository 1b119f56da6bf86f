#!/usr/bin/env python
"""Scale-growth measurement for the flagship heavy operators: does their
WORK grow linearly with corpus size, measured out to 10x?

A plan that looks right at sf0.1 can still hide superlinear work (the
classic failure: LSH candidate pairs growing quadratically inside dup
cohorts).  Wall time on a shared host is too noisy to prove scaling at
this corpus size, so the primary metrics here are deterministic work
counts -- band-bucket maxima, candidate pairs, verified pairs, cell
populations -- which are exact functions of the data.  Time is reported
as a secondary signal (min of 3, steady state).  For every metric the
output carries a fitted growth exponent: the least-squares slope of
log(metric) vs log(k) over k in {1, 2, 4, 10} -- ~1.0 is linear, and the
10x rung means the exponents are measured, not extrapolated, across a
full decade.

Corpus construction: the sf0.1 documents are replicated k times with id
offsets and a per-replica ROTATION of a 10-letter alphabet
("aeiousrtln"): a bijective letter permutation, so each replica keeps
the original's internal duplicate structure EXACTLY (equal texts stay
equal, shingle sets map bijectively) while any shingle containing one of
those ten frequent letters differs across replicas -- replicas never
near-collide at the Jaccard threshold.  A scale-correct pipeline
therefore VERIFIES exactly k times the 1x pairs.  (Letter-free shingles
-- digits, punctuation -- are rotation-invariant, so their doc families
span all k replicas and their raw band-bucket cohorts grow k-fold: raw
candidate counts fit superlinear BY CONSTRUCTION at large k, and the
skew filter + size-gated verify absorbing that inflation back to linear
verified work is precisely the property under test.)  Embedding
replicas are component rotations (orthogonal: within-replica cosines
bit-identical, cross-replica cosines scrambled).

Covered: x07 (MinHash LSH), x26 (connected components), x50 (keep-best),
x54 (semantic dedup), x55 (decontamination, fixed benchmark set), x66
(edit-distance join d=2).

Run: python scale_bench.py  (one JSON line to stdout).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time


ALPHA = "aeiousrtln"  # 10 distinct rotations -> supports k up to 10
KS = (1, 2, 4, 10)


def _fit_exponent(points: dict) -> float:
    """Least-squares slope of log(v) vs log(k) -- the growth exponent."""
    xy = [
        (math.log(k), math.log(v))
        for k, v in points.items()
        if v and v > 0 and k > 0
    ]
    if len(xy) < 2:
        return float("nan")
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxx = sum(x * x for x, _ in xy)
    sxy = sum(x * y for x, y in xy)
    return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 2)


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
            # Keep JVM unified-logging warnings off stdout -- one JSON
            # line is the contract (a GCLocker warning corrupted it once).
            "spark.driver.extraJavaOptions": "-Xlog:disable",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    work = tempfile.mkdtemp(prefix="scale_bench_")

    def build(k: int) -> str:
        path = f"{work}/docs_x{k}"
        rep = spark.range(k).select(F.col("id").alias("rep"))
        rot_text = F.col("text")
        for i in range(1, k):
            rot = ALPHA[i:] + ALPHA[:i]
            rot_text = F.when(
                F.col("rep") == i, F.translate(F.col("text"), ALPHA, rot)
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

    from conecta_spark.operators import cluster, dedup

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

    run(
        spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
            _warm, "id long"
        )
    )

    def timed(thunk, reps: int = 3) -> float:
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            thunk()
            best = min(best or 1e9, time.perf_counter() - t0)
        return round(best, 2)

    # -- x07 LSH + x26 connected components + x50 keep-best --------------
    results: dict[str, dict] = {}
    try:
        for k in KS:
            docs = spark.read.parquet(build(k))
            stats = lsh_work(docs)
            stats["lsh_seconds"] = timed(
                lambda: run(dedup.minhash_lsh_pairs(docs))
            )
            pairs = dedup.minhash_lsh_pairs(docs).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            stats["n_pairs"] = pairs.count()
            cc = cluster.connected_components(pairs)
            stats["n_clustered_docs"] = cc.count()
            stats["n_clusters"] = (
                cc.select("cluster_id").distinct().count()
            )
            stats["cc_seconds"] = timed(
                lambda: run(cluster.connected_components(pairs)), 2
            )
            # The distributed label-propagation branch (what a >1M-edge
            # graph takes at 100 TB; x67's path) swept at every scale:
            # the min(self, neighbors) seed makes shallow components
            # converge in one confirmation round regardless of k, so its
            # time should track the edge count, not the round count.
            # Cluster-count equality cross-checks the two branches.
            cc_dist = cluster.connected_components(
                pairs, small_graph_threshold=0
            )
            stats["n_clusters_distributed"] = (
                cc_dist.select("cluster_id").distinct().count()
            )
            assert stats["n_clusters_distributed"] == stats["n_clusters"], (
                f"branch divergence at k={k}: union-find "
                f"{stats['n_clusters']} vs label-prop "
                f"{stats['n_clusters_distributed']}"
            )
            stats["cc_distributed_seconds"] = timed(
                lambda: run(
                    cluster.connected_components(
                        pairs, small_graph_threshold=0
                    )
                ),
                2,
            )
            cc_p = cluster.connected_components(pairs).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            cc_p.count()
            stats["keep_best_seconds"] = timed(
                lambda: run(cluster.keep_best_per_cluster(docs, cc_p)), 2
            )
            cc_p.unpersist()
            pairs.unpersist()
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
    decres: dict[str, dict] = {}
    work2 = tempfile.mkdtemp(prefix="scale_bench_emb_")
    try:
        for k in KS:
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
                    "rep",
                )
                .repartition(int(cpus))
                .write.mode("overwrite")
                .parquet(path)
            )
            full = spark.read.parquet(path)
            docs = full.drop("rep")
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

            # -- x55 decontamination: FIXED benchmark set, growing corpus.
            # Production shape: the eval benchmark does not grow with the
            # corpus.  Keep only replica 0's label-9 rows as the bench
            # side; the corpus side is every replica's label<>9 rows, so
            # the broadcast matrix is constant and total work is one scan
            # of the growing corpus (exponent ~1).
            dec_in = full.where(
                (F.col("label") != 9) | (F.col("rep") == 0)
            ).drop("rep")
            n_corpus = dec_in.where(F.col("label") != 9).count()
            hits = simsearch.semantic_contamination(
                dec_in, bench_label=9, threshold=0.40
            )
            decres[f"x{k}"] = {
                "corpus_rows": n_corpus,
                "hits": hits.count(),
                "decontam_seconds": timed(
                    lambda: run(
                        simsearch.semantic_contamination(
                            dec_in, bench_label=9, threshold=0.40
                        )
                    )
                ),
            }
            print(f"decontam x{k}: {decres[f'x{k}']}", file=sys.stderr)
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
    tags = ["AAA", "BBB", "CCC", "DDD", "EEE", "FFF", "GGG", "HHH", "III", "JJJ"]
    for k in KS:
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

    def exponents(per_scale: dict, keys: tuple) -> dict:
        return {
            m: _fit_exponent(
                {k: per_scale[f"x{k}"][m] for k in KS if f"x{k}" in per_scale}
            )
            for m in keys
        }

    out = {
        "metric": "scale_growth_10x",
        "base_docs": n_base,
        "ks": list(KS),
        "per_scale": results,
        "lsh_exponents": exponents(
            results,
            (
                "cand_pairs",
                "verified_pairs",
                "n_pairs",
                "lsh_seconds",
                "cc_seconds",
                "cc_distributed_seconds",
                "keep_best_seconds",
                "n_clusters",
            ),
        ),
        "semdedup_per_scale": semres,
        "semdedup_exponents": exponents(
            semres, ("cell_pairs", "max_cell", "dups")
        ),
        "decontam_per_scale": decres,
        "decontam_exponents": exponents(
            decres, ("corpus_rows", "hits", "decontam_seconds")
        ),
        "editjoin_per_scale": edres,
        "editjoin_exponents": exponents(
            edres, ("cand_pairs", "verified_pairs")
        ),
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
