"""End-to-end RAG corpus preparation through public APIs: boilerplate
span removal -> passage chunking -> exact chunk dedup -> sequence packing
-> accounting.  The point is that the round's new operators COMPOSE --
each stage consumes exactly what the previous one emits -- and that the
whole chain is deterministic (bit-identical on a re-run), which is what
makes a corpus build reproducible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark.sql.window import Window

from conecta_spark.functions.sampling import sequence_pack
from conecta_spark.functions.text import passage_chunks
from conecta_spark.operators.dedup import span_scrub
from conecta_spark.queries import t


def _build(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    # 1. strip corpus-duplicated boilerplate spans (keep first occurrence)
    clean = span_scrub(docs).where(F.length("clean_text") > 0)
    # 2. split surviving text into overlapping retrieval passages
    chunks = passage_chunks(
        clean.select("doc_id", F.col("clean_text").alias("text")),
        chunk_tokens=32,
        stride=24,
    ).select(
        (F.col("doc_id") * 10_000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    # 3. overlap + boilerplate make exact-duplicate passages: keep the
    # lowest-id copy of each distinct chunk text (the x37 dedup form)
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    unique = (
        chunks.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    # 4. pack survivors into fixed training sequences (single stream)
    packed = sequence_pack(
        unique.withColumn("lang", F.lit("en")), seq_len=256, shards=4
    )
    return unique, packed


def test_rag_pipeline_composes_and_accounts(spark, oracle_dir):
    unique, packed = _build(spark, oracle_dir)
    stats = packed.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("seq_id").alias("n_seqs"),
        F.sum("n_tok").alias("total_tokens"),
    ).collect()[0]
    assert stats.n_chunks > 500          # chunking multiplied documents
    assert 0 < stats.n_seqs < stats.n_chunks
    # packing conserves chunks and tokens: every deduped chunk lands in
    # exactly one sequence
    assert stats.n_chunks == unique.count()
    want_tokens = unique.select(
        F.sum(
            F.when(F.length(F.trim("text")) == 0, 0).otherwise(
                F.size(F.split(F.trim("text"), r"\s+"))
            )
        )
    ).collect()[0][0]
    assert stats.total_tokens == want_tokens


def test_rag_pipeline_is_reproducible(spark, oracle_dir):
    a = _build(spark, oracle_dir)[1]
    b = _build(spark, oracle_dir)[1]
    cols = sorted(a.columns)
    assert sorted(
        map(tuple, a.select(*cols).collect())
    ) == sorted(map(tuple, b.select(*cols).collect()))
