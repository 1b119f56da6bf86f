"""End-to-end training-data pipeline composition: the sequence a real
corpus build runs, chained through the public operator APIs on one
DataFrame lineage.  Catches cross-operator friction (column contracts,
lazy-plan composition, persisted-state interactions) that per-operator
tests cannot.

load -> PII redaction -> quality gate -> exact dedup -> near-dup cluster
pruning -> stratified sample -> token accounting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conecta_spark.functions.quality import gopher_pass
from conecta_spark.functions.scrub import redact_pii
from conecta_spark.functions.text import ws_token_count
from conecta_spark.operators.cluster import connected_components
from conecta_spark.operators.dedup import dedup_exact, minhash_lsh_pairs


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    from conecta_spark.sources.parquet import load_parquet

    return load_parquet(spark, f"{sf_dir}/documents.parquet").cache()


def test_full_pipeline_composes(spark, corpus):
    n0 = corpus.count()

    # 1. PII redaction: same row count, text_redacted present.
    redacted = redact_pii(corpus).withColumn("text", F.col("text_redacted"))
    assert redacted.count() == n0

    # 2. Quality gate.
    kept = redacted.where(gopher_pass())
    n_kept = kept.count()
    assert 0 < n_kept <= n0

    # 3. Exact dedup: keep one doc per distinct text.
    survivors = dedup_exact(kept).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    deduped = kept.join(survivors, "doc_id")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_kept

    # 4. Near-dup clusters: drop all but the canonical member.
    pairs = minhash_lsh_pairs(deduped, threshold=0.5)
    cc = connected_components(pairs)
    drop = cc.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    pruned = deduped.join(drop, "doc_id", "left_anti")
    n_pruned = pruned.count()
    assert 0 < n_pruned <= n_dedup
    # every cluster still has exactly its canonical member present
    canon = {r.cluster_id for r in cc.select("cluster_id").distinct().collect()}
    present = {
        r.doc_id
        for r in pruned.select("doc_id").collect()
    }
    assert canon <= present

    # 5. Deterministic 50% sample + token accounting.
    from conecta_spark.functions.sampling import deterministic_sample

    sampled = deterministic_sample(pruned, pct=50)
    n_sample = sampled.count()
    assert 0 < n_sample < n_pruned

    total_tokens = (
        sampled.select(ws_token_count().alias("t"))
        .agg(F.sum("t").cast("long").alias("total"))
        .collect()[0]["total"]
    )
    assert total_tokens > 0

    # determinism: the whole chain reproduces bit-for-bit
    again = deterministic_sample(pruned, pct=50)
    assert {r.doc_id for r in sampled.select("doc_id").collect()} == {
        r.doc_id for r in again.select("doc_id").collect()
    }
