"""The corpus-build pipeline as ONE registered, fully-oracled query.

tests/test_pipeline_e2e.py proves the stages compose through the public
APIs; this module additionally registers the composition itself
(quality-gate -> redact -> exact-dedup -> deterministic-sample -> per-lang
accounting) so the driver's DuckDB oracle checks the END-TO-END dataflow,
not just each stage in isolation -- the whole-pipeline twin a corpus build
would actually ship.

Scale shape (100 TB): redaction and gating are zero-shuffle codegen maps;
the only shuffles are the dedup hash (fixed-width sha256 key, uniform) and
the final low-cardinality per-lang aggregate; the sample is a map-side
filter on integer arithmetic.  Text leaves the scan exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries import register, t
from .quality import _duck_signals, gopher_pass
from .sampling import _duck_bucket, deterministic_sample
from .scrub import _duck_redact, redact_pii
from .text import ws_token_count


def build_corpus(df: DataFrame, sample_pct: int = 50,
                 id_col: str = "doc_id") -> DataFrame:
    """Gopher gate -> redact survivors -> exact-dedup (min id survives) ->
    hash sample -> per-lang accounting.

    Gate BEFORE redaction: quality signals read the scan column ``text``
    directly, so Catalyst's project-collapse cannot inline the 3-pattern
    redaction into each of the ~6 signal expressions (gating on
    ``text_redacted`` measured 8.0 s vs ~2 s at sf0.1 from exactly that
    expression blowup), and redaction only runs on surviving docs --
    the order a production corpus build uses anyway."""
    from pyspark.sql.window import Window

    from ..plans.skew import spread

    # spread: the gate's ~6 signal regex/lambda expressions and the
    # 3-pattern redaction are the pipeline's per-row CPU; on a
    # narrower-than-cluster scan they would run on one core (measured
    # single-task at sf0.1).  No-op once the scan is cluster-wide.
    gated = redact_pii(spread(df).where(gopher_pass("text")))
    w = Window.partitionBy(F.sha2(F.col("text_redacted"), 256)).orderBy(
        id_col
    )
    deduped = (
        gated.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    sampled = deterministic_sample(deduped, pct=sample_pct, id_col=id_col)
    n_pii = F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_token_count("text_redacted")).cast("long").alias("n_tokens"),
        F.sum(F.length("text_redacted")).cast("long").alias("n_chars"),
        F.sum(n_pii).cast("long").alias("n_pii_redacted"),
    )


def _duck_gopher_pass(col: str) -> str:
    s = _duck_signals(col)
    return (
        f"({s['n_words']} >= 5 AND {s['n_words']} <= 100000 "
        f"AND {s['mean_word_len']} >= 2.0 AND {s['mean_word_len']} <= 12.0 "
        f"AND {s['symbol_word_ratio']} <= 0.3 "
        f"AND {s['top_word_frac']} <= 0.2)"
    )


_DUCK_NTOK_RED = r"len(regexp_split_to_array(trim(text_redacted), '\s+'))"


@register(
    "x37_corpus_pipeline",
    "WITH g0 AS (SELECT doc_id, lang, text FROM documents WHERE "
    + _duck_gopher_pass("text")
    + "), "
    "gated AS (SELECT doc_id, lang, " + _duck_redact() + " FROM g0), "
    "dd AS (SELECT *, row_number() OVER ("
    " PARTITION BY text_redacted ORDER BY doc_id) AS rn FROM gated), "
    "sam AS (SELECT * FROM dd WHERE rn = 1 AND "
    + _duck_bucket("doc_id")
    + " < 50) "
    "SELECT lang, COUNT(*) AS n_docs, "
    f"CAST(SUM({_DUCK_NTOK_RED}) AS BIGINT) AS n_tokens, "
    "CAST(SUM(length(text_redacted)) AS BIGINT) AS n_chars, "
    "CAST(SUM(n_email + n_ipv4 + n_phone) AS BIGINT) AS n_pii_redacted "
    "FROM sam GROUP BY lang",
    "end-to-end corpus build: gopher gate -> redact -> exact dedup -> 50% "
    "deterministic sample -> per-lang doc/token/char/PII accounting, "
    "oracle-checked as one dataflow",
)
def x37_pipeline(spark, sf_dir) -> DataFrame:
    return build_corpus(t(spark, sf_dir, "documents"))
