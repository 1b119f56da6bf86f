"""Corpus-hygiene operators a training-data pipeline runs before anything
else ships: PII redaction, benchmark-contamination detection, and repetition
scoring (extension surface, SURVEY 2.4 family; no reference counterpart).

All three are oracle-checked end-to-end:

* patterns are restricted to the regex subset Java (Spark) and RE2 (DuckDB)
  agree on -- character classes, bounded repetition, ``\\b`` -- no
  lookaround, no backreferences;
* contamination reuses the engine polyhash shingles (functions/text.py), so
  hash sets are bit-identical across engines;
* fractions divide exact integer counts, giving bit-identical doubles.

Scale notes (100 TB):

* PII redaction is a per-row JVM ``regexp_replace`` map -- whole-stage
  codegen, no shuffle, no Python.
* contamination broadcasts the *benchmark* shingle set (test/eval sets are
  bounded -- thousands of documents -- regardless of corpus size) and
  intersects per row: zero shuffle of the corpus, the same pattern as the
  MinHash document-frequency filter (operators/dedup.py).
* repetition explodes to (doc, bigram) and aggregates twice with map-side
  partial aggregation; the shuffle key (doc_id, bigram) is high-cardinality
  and unskewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import _DUCK_SH_HASHES, hashed_shingles
from ..queries import register, t

# -- PII redaction -----------------------------------------------------------

#: (label, pattern, replacement) -- Java/RE2-common syntax only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII spans in ``text_col`` and count hits per kind.

    One fused projection: all patterns apply in sequence inside a single
    whole-stage-codegen map (Spark ``regexp_replace`` replaces every
    occurrence; counts via ``regexp_count`` before replacement)."""
    out = df
    red = F.col(text_col)
    for label, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{label}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn("text_redacted", red)


def _duck_redact() -> str:
    red = "text"
    counts = []
    for label, pat, repl in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all(text, '{pat}'))::INT AS n_{label}"
        )
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"{', '.join(counts)}, {red} AS text_redacted"


# -- benchmark contamination -------------------------------------------------


def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    min_overlap: int = 10,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents sharing >= ``min_overlap`` distinct ``k``-char shingle
    hashes with the benchmark corpus -- the standard train/test
    decontamination check.

    The benchmark's distinct shingle set collapses to a one-row broadcast
    array (eval sets are bounded; the corpus is not) and every document
    intersects it in place -- the corpus is never shuffled.  Benchmark
    documents present in ``df`` report their own full overlap -- callers
    exclude them or treat those rows as the join key back to the eval set.

    Shingle hashing goes through :func:`~conecta_spark.operators.dedup.
    hashed_shingles` (vectorized numpy, bit-identical to the SQL expr and
    the DuckDB oracle), the same front end as the MinHash pipeline."""
    sh = hashed_shingles(df, k, text_col, id_col)
    bench_hs = (
        hashed_shingles(benchmark, k, text_col, id_col)
        .select(F.explode("sh").alias("h"))
        .distinct()
        .agg(F.sort_array(F.collect_list("h")).alias("bench_hs"))
    )
    return (
        sh.crossJoin(F.broadcast(bench_hs))
        .select(
            id_col,
            F.size(F.array_intersect("sh", "bench_hs")).alias("n_overlap"),
        )
        .where(F.col("n_overlap") >= min_overlap)
    )


# -- repetition (Gopher-style top-bigram fraction) ---------------------------


def top_bigram_fraction(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per document: total word-bigram count and the fraction taken by the
    most frequent bigram -- high values flag boilerplate/repetitive text
    (Gopher repetition signal family; complements unique_word_frac in
    functions/quality.py).

    The statistic is strictly per-document, so the physical plan is a
    zero-shuffle Arrow-batched map: exploding to (doc, bigram) rows and
    double-aggregating instead shuffles ~text-size x corpus through the
    cluster (measured 5.9s vs 0.7s at sf0.1 -- and the shuffle, not the
    counting, is what breaks at 100 TB).  ASCII parity caveat as in
    ``fingerprints_pandas``: Python ``str.lower``/``\\s`` vs SQL
    ``lower``/Java ``\\s`` agree on ASCII text.

    Per-doc counting: equal (w1, w2) token pairs iff equal "w1 w2" strings
    (tokens cannot contain whitespace), so Counter-over-pairs reproduces
    the oracle's string-bigram grouping; max/total uses exact integer
    operands, giving bit-identical doubles."""
    import re

    schema = f"{id_col} long, n_bigrams long, top_bigram_frac double"

    def batches(it):
        from collections import Counter

        import pandas as pd

        ws = re.compile(r"\s+")
        for pdf in it:
            ids, tot, frac = [], [], []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                if s is None:
                    continue
                w = ws.split(s.strip().lower())
                if len(w) < 2:
                    continue
                counts = Counter(zip(w, w[1:]))
                n = len(w) - 1
                ids.append(did)
                tot.append(n)
                frac.append(max(counts.values()) / n)
            yield pd.DataFrame(
                {id_col: ids, "n_bigrams": tot, "top_bigram_frac": frac}
            )

    from ..plans.skew import spread

    return spread(df.select(id_col, text_col)).mapInPandas(batches, schema)


# -- registered queries ------------------------------------------------------


@register(
    "x30_pii_redaction",
    f"SELECT doc_id, {_duck_redact()} FROM documents",
    "PII redaction: email/ipv4/phone counts + redacted text, pure JVM regex",
)
def x30_pii(spark, sf_dir) -> DataFrame:
    from ..plans.skew import spread

    # spread: the 3-pattern regexp_replace + 3 regexp counts are per-row
    # JVM CPU on a narrower-than-cluster scan (single-task at sf0.1);
    # no-op once the scan is cluster-wide.
    d = spread(t(spark, sf_dir, "documents"))
    return redact_pii(d).select(
        "doc_id",
        *[f"n_{label}" for label, _, _ in PII_PATTERNS],
        "text_redacted",
    )


@register(
    "x31_contamination",
    # shingle+hash SQL shared with the x07 oracle (operators/dedup.py) so
    # the two pipelines stay bit-identical
    f"WITH sh AS (SELECT doc_id, {_DUCK_SH_HASHES} AS sh FROM documents), "
    "bench AS (SELECT list(DISTINCT h) AS bench_hs FROM ("
    " SELECT unnest(sh) AS h FROM sh WHERE doc_id % 97 = 0)) "
    "SELECT doc_id, len(list_intersect(sh, bench_hs))::INT AS n_overlap "
    "FROM sh CROSS JOIN bench WHERE len(list_intersect(sh, bench_hs)) >= 200",
    "train/test contamination: shingle-hash overlap vs the doc_id%97==0 "
    "benchmark slice (broadcast benchmark set, zero corpus shuffle). "
    "Registered threshold is 200: the synthetic word-salad corpus shares "
    "~130 shingles between UNRELATED docs (median), so the real-corpus "
    "default of 10 would flag everything here",
)
def x31_contamination(spark, sf_dir) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return contamination(
        d, d.where(F.col("doc_id") % 97 == 0), min_overlap=200
    )


@register(
    "x32_top_bigram_frac",
    "WITH toks AS (SELECT doc_id, "
    r" regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents), "
    "bg AS (SELECT doc_id, unnest(list_transform("
    " range(1, greatest(len(w) - 1, 0) + 1), "
    " i -> w[i] || ' ' || w[i+1])) AS bg FROM toks), "
    "cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg) "
    "SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, "
    " MAX(c)::DOUBLE / SUM(c)::DOUBLE AS top_bigram_frac "
    "FROM cnt GROUP BY doc_id",
    "repetition: fraction of word bigrams taken by the most frequent one",
)
def x32_top_bigram(spark, sf_dir) -> DataFrame:
    return top_bigram_fraction(t(spark, sf_dir, "documents"))
