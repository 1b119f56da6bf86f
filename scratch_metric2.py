"""Scratch 2: per-query recall distributions for x13/x14 metric design."""
import sys

from pyspark.sql import functions as F

from conecta_spark.session import get_session
from conecta_spark.queries import t
from conecta_spark.operators.simsearch import (
    brp_lsh_ml, ivf_topk, build_ivf_index, ivf_search, _vectors, DIM,
    cosine_expr,
)

spark = get_session()
QIDS = [0, 1, 2, 3, 4]

for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    print("=====", sf)
    emb = t(spark, sf, "embeddings")
    v = _vectors(emb).persist()
    print("corpus", v.count())
    for qid in QIDS:
        q = v.where(F.col("vec_id") == qid).select(F.col("v").alias("qv"))
        l2 = (
            v.join(F.broadcast(q))
            .where(F.col("vec_id") != qid)
            .select(
                "vec_id",
                F.expr(
                    "aggregate(zip_with(v, qv, (a,b) -> (a-b)*(a-b)), 0.0D, (acc,x) -> acc+x)"
                ).alias("d2"),
            )
            .orderBy(F.col("d2").asc(), F.col("vec_id"))
            .limit(10)
        )
        exact_l2 = {r.vec_id for r in l2.collect()}
        brp = {r.vec_id for r in brp_lsh_ml(emb, query_id=qid, k=10).collect()}
        cos = (
            v.join(F.broadcast(q))
            .where(F.col("vec_id") != qid)
            .select("vec_id", F.round(F.expr(cosine_expr("v", "qv", DIM)), 6).alias("s"))
            .orderBy(F.col("s").desc(), F.col("vec_id"))
            .limit(10)
        )
        exact_cos = {r.vec_id for r in cos.collect()}
        row = [f"q{qid} brp={len(exact_l2 & brp) / 10:.1f}"]
        for np_ in (2, 4, 8):
            ivf = {
                r.vec_id
                for r in ivf_topk(emb, query_id=qid, k=10, n_probe=np_).collect()
            }
            row.append(f"ivf{np_}={len(exact_cos & ivf) / 10:.1f}")
        print(" ".join(row))
        sys.stdout.flush()
    v.unpersist()
spark.stop()
