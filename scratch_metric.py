"""Scratch: measure ml-path quality metrics to pick safe oracle thresholds."""
import sys

from pyspark.sql import functions as F

from conecta_spark.session import get_session
from conecta_spark.queries import t
from conecta_spark.operators.simsearch import (
    brp_lsh_ml, ivf_topk, _vectors, DIM, cosine_expr,
)
from conecta_spark.operators.dedup import (
    minhash_lsh_ml, word_shingles_expr, BASELINE_SLICE,
)

spark = get_session()

for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    print("=====", sf)
    emb = t(spark, sf, "embeddings")
    v = _vectors(emb)
    q = v.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    # exact L2 top-10
    l2 = (
        v.join(F.broadcast(q))
        .where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.expr(
                f"aggregate(zip_with(v, qv, (a,b) -> (a-b)*(a-b)), 0.0D, (acc,x) -> acc+x)"
            ).alias("d2"),
        )
        .orderBy(F.col("d2").asc(), F.col("vec_id"))
        .limit(10)
    )
    exact_l2 = [r.vec_id for r in l2.collect()]
    brp = [r.vec_id for r in brp_lsh_ml(emb, query_id=0, k=10).collect()]
    print("x13 BRP recall@10:", len(set(exact_l2) & set(brp)) / 10, "returned", len(brp))

    cos = (
        v.join(F.broadcast(q))
        .where(F.col("vec_id") != 0)
        .select("vec_id", F.round(F.expr(cosine_expr("v", "qv", DIM)), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("vec_id"))
        .limit(10)
    )
    exact_cos = [r.vec_id for r in cos.collect()]
    ivf = [r.vec_id for r in ivf_topk(emb, query_id=0, k=10).collect()]
    print("x14 IVF recall@10:", len(set(exact_cos) & set(ivf)) / 10, "returned", len(ivf))

    # x25 sketches vs exact
    e = t(spark, sf, "events")
    ag = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("au"),
        F.countDistinct("user_id").alias("eu"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("ap"),
        F.expr("percentile(value, 0.95)").alias("ep"),
        F.max("value").alias("mx"),
        F.min("value").alias("mn"),
        F.count(F.lit(1)).alias("c"),
    ).collect()
    for r in ag:
        rng = (r.mx - r.mn) or 1.0
        print(
            f"x25 {r.event_type}: n={r.c} users rel_err="
            f"{abs(r.au - r.eu) / max(r.eu, 1):.4f} p95 range_err="
            f"{abs(r.ap - r.ep) / rng:.5f}"
        )

    # x09 ml MinHashLSH vs exact word-3gram jaccard pairs
    docs = t(spark, sf, "documents").where(F.col("doc_id") < BASELINE_SLICE)
    sh = docs.select(
        "doc_id", F.expr(word_shingles_expr("text", 3)).alias("sh")
    ).where(F.size("sh") > 0)
    a, b = sh.alias("a"), sh.alias("b")
    exact_pairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("j"),
        )
        .where(F.col("j") >= 0.5)
    )
    ep = {(r.doc_a, r.doc_b): r.j for r in exact_pairs.collect()}
    mlp = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_ml(docs, threshold=0.5).collect()
    }
    inter = set(ep) & set(mlp)
    print(
        f"x09: exact={len(ep)} ml={len(mlp)} inter={len(inter)} "
        f"recall={len(inter) / max(len(ep), 1):.4f} "
        f"false_pos={len(set(mlp) - set(ep))}"
    )
    for p in sorted(set(mlp) - set(ep))[:5]:
        print("   fp:", p, mlp[p], "exact_j=", ep.get(p))
    sys.stdout.flush()
spark.stop()
