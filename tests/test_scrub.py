"""Behavioral tests for corpus-hygiene operators (functions/scrub.py):
planted PII is redacted, planted contamination is flagged, repetition
scores order as expected.  (Engine parity is covered by test_oracle.py.)"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conecta_spark.functions.scrub import (
    contamination,
    redact_pii,
    top_bigram_fraction,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from conecta_spark.sources.parquet import load_parquet

    return load_parquet(spark, f"{sf_dir}/documents.parquet").cache()


def test_redact_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and 10.0.0.1 or +4915112345678 end"),
            (2, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].n_email == 1
    assert rows[1].n_ipv4 == 1
    assert rows[1].n_phone == 1
    assert "<EMAIL>" in rows[1].text_redacted
    assert "<IP>" in rows[1].text_redacted
    assert "<PHONE>" in rows[1].text_redacted
    assert "bob@example.com" not in rows[1].text_redacted
    assert rows[2].text_redacted == rows[2].text
    assert rows[2].n_email == rows[2].n_ipv4 == rows[2].n_phone == 0


def test_contamination_flags_planted_copy(docs):
    """A doc copied verbatim from the benchmark slice must be flagged."""
    bench = docs.limit(5)
    copy = bench.limit(1).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionAll(copy)
    hits = {r.doc_id for r in contamination(corpus, bench).collect()}
    planted = copy.collect()[0].doc_id
    assert planted in hits
    # benchmark docs self-report (documented behavior)
    assert all(b.doc_id in hits for b in bench.select("doc_id").collect())


def test_contamination_clean_doc_not_flagged(spark, docs):
    bench = docs.limit(3)
    clean = spark.createDataFrame(
        [(777777, "zzqx wvut plok mjnh bgty vfrc dxse zaqw")],
        "doc_id long, text string",
    )
    hits = {r.doc_id for r in contamination(clean, bench).collect()}
    assert 777777 not in hits


def test_top_bigram_fraction_orders_repetition(spark):
    df = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham"),
            (2, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in top_bigram_fraction(df).collect()}
    # doc 1: 7 bigrams, "spam ham" x4 -> 4/7; doc 2: all distinct -> 1/7
    assert rows[1].n_bigrams == 7 and abs(rows[1].top_bigram_frac - 4 / 7) < 1e-12
    assert rows[2].n_bigrams == 7 and abs(rows[2].top_bigram_frac - 1 / 7) < 1e-12


def test_single_token_doc_has_no_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in top_bigram_fraction(df).collect()}
    assert 1 not in rows  # no bigrams -> no row (matches oracle semantics)
    assert rows[2].n_bigrams == 1
