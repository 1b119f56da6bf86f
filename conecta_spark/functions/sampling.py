"""Reproducible corpus sampling + distribution diagnostics (extension
surface, SURVEY 2.4): the bread-and-butter ops of assembling a training
mix -- take a deterministic fraction of a corpus, and inspect its length
distribution.

Why hash-based instead of ``df.sample()``: Bernoulli sampling is seeded
per-partition, so the sampled *set* changes with partitioning, retries,
and engine -- unacceptable for a training run that must be reproducible
and auditable (and impossible to oracle-check).  A multiplicative hash of
the stable document id gives a sample that is a pure function of the data:
same rows on Spark, DuckDB, or any future engine, any cluster size.  The
hash is the engine's polyhash-family integer arithmetic, kept below 2^63
by pre-reducing the id mod M.

Scale notes (100 TB): both ops are single-pass, shuffle-free row filters /
partial aggregations; the sample predicate is a pushdown-friendly integer
expression on one column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries import register, t

MOD = 1_000_000_007
_MIX = 2654435761  # Knuth multiplicative constant (same family as dedup)


def hash_bucket(id_col: str = "doc_id", buckets: int = 100) -> F.Column:
    """Deterministic bucket in [0, buckets) from the id: engine-portable
    integer arithmetic (no xxhash/md5 dependence on either side)."""
    return (F.col(id_col) % MOD) * _MIX % MOD % buckets


def deterministic_sample(
    df: DataFrame, pct: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Keep rows whose hash bucket < ``pct`` (of 100): a reproducible
    ``pct``-percent sample, stable across engines and partitionings."""
    return df.where(hash_bucket(id_col) < pct)


def _duck_bucket(id_col: str = "doc_id", buckets: int = 100) -> str:
    return f"(({id_col} % {MOD}) * {_MIX}) % {MOD} % {buckets}"


def length_histogram(
    df: DataFrame,
    length_col: str = "n_chars",
    bucket_width: int = 50,
    max_bucket: int = 20,
) -> DataFrame:
    """Document-length histogram: fixed-width buckets with an overflow
    bucket at ``max_bucket`` (training-mix length-distribution check)."""
    bucket = F.least(
        (F.col(length_col) / F.lit(bucket_width)).cast("long"),
        F.lit(max_bucket),
    )
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(length_col).alias("min_len"),
            F.max(length_col).alias("max_len"),
        )
    )


@register(
    "x27_deterministic_sample",
    f"SELECT doc_id, lang, source FROM documents WHERE {_duck_bucket()} < 10",
    "reproducible 10% corpus sample via engine-portable id hashing",
)
def x27_sample(spark, sf_dir) -> DataFrame:
    return deterministic_sample(t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source"
    )


@register(
    "x28_length_histogram",
    "SELECT LEAST(n_chars // 50, 20) AS bucket, COUNT(*) AS n_docs, "
    "MIN(n_chars) AS min_len, MAX(n_chars) AS max_len "
    "FROM documents GROUP BY LEAST(n_chars // 50, 20)",
    "corpus length distribution: fixed-width histogram with overflow bucket",
)
def x28_histogram(spark, sf_dir) -> DataFrame:
    return length_histogram(t(spark, sf_dir, "documents"))


#: Default per-language keep rates (percent of 100) for the stratified
#: sample: the usual training-mix move of downsampling dominant languages.
STRATA_RATES: dict[str, int] = {"en": 20, "es": 10, "fr": 10, "de": 5}


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int] | None = None,
    strata_col: str = "lang",
    default_rate: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sample: keep a row when its hash bucket
    falls under its stratum's rate.  Same reproducibility story as
    :func:`deterministic_sample` -- the kept set is a pure function of the
    data, unlike ``df.sampleBy`` whose per-partition seeding ties results
    to the physical plan."""
    rates = rates if rates is not None else STRATA_RATES
    rate = F.lit(default_rate)
    for k, v in rates.items():
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.where(hash_bucket(id_col) < rate)


def _duck_rate_case(rates: dict[str, int], strata_col: str, default: int) -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in rates.items()
    )
    return f"CASE {strata_col} {whens} ELSE {default} END"


@register(
    "x29_stratified_sample",
    "SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_id "
    f"FROM documents WHERE {_duck_bucket()} < "
    f"{_duck_rate_case(STRATA_RATES, 'lang', 10)} GROUP BY lang",
    "stratified corpus sample: per-language keep rates, reproducible "
    "hash-bucket membership (training-mix rebalancing)",
)
def x29_stratified(spark, sf_dir) -> DataFrame:
    kept = stratified_sample(t(spark, sf_dir, "documents"))
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("first_id"),
    )


# ---------------------------------------------------------------------------
# balanced source mixing (training-mix construction)
# ---------------------------------------------------------------------------

_MIX_BUCKETS = 10_000


def balanced_source_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Downsample every source toward the smallest source's document count
    (a balanced training mix), deterministically: a document survives iff
    its hash bucket (of 10000) falls below ``10000 * min_count DIV
    source_count`` -- pure BIGINT arithmetic, so the kept *set* is a
    function of the data alone (same rows on any engine or partitioning),
    and the achieved per-source counts concentrate within ~1% of target.
    Returns the per-source audit: total docs, kept docs, kept chars.

    Scale design: per-source counts are one tiny partial aggregation,
    broadcast-joined back onto the corpus (the corpus itself never
    shuffles -- compare a window over ``source``, which would shuffle
    100 TB by a low-cardinality, skew-prone key); the survivor filter is a
    map-side integer predicate, and the audit re-aggregates to one row per
    source.  Rates adapt automatically as sources grow: re-running after
    ingest keeps the mix balanced with no re-tuning.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_total"))
    tgt = counts.agg(F.min("n_total").alias("m"))
    kept = (
        df.join(F.broadcast(counts), source_col)
        .crossJoin(F.broadcast(tgt))
        .where(
            hash_bucket(id_col, _MIX_BUCKETS)
            < F.expr(f"{_MIX_BUCKETS} * m DIV n_total")
        )
    )
    return kept.groupBy(source_col, "n_total").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(weight_col).cast("long").alias("chars_kept"),
    )


@register(
    "x41_balanced_source_mix",
    "WITH counts AS (SELECT source, COUNT(*) AS n_total FROM documents "
    " GROUP BY source), "
    "tgt AS (SELECT MIN(n_total) AS m FROM counts), "
    "kept AS ("
    " SELECT d.source, d.n_chars, c.n_total"
    " FROM documents d JOIN counts c ON d.source = c.source CROSS JOIN tgt"
    f" WHERE {_duck_bucket('d.doc_id', _MIX_BUCKETS)}"
    f"  < ({_MIX_BUCKETS} * tgt.m) // c.n_total) "
    "SELECT source, n_total, COUNT(*) AS n_kept, "
    " CAST(SUM(n_chars) AS BIGINT) AS chars_kept "
    "FROM kept GROUP BY source, n_total",
    "balanced training-mix sampler: every source deterministically "
    "downsampled toward the smallest source's count (corpus never "
    "shuffles; per-source audit row out)",
)
def x41_source_mix(spark, sf_dir) -> DataFrame:
    return balanced_source_mix(t(spark, sf_dir, "documents"))


def token_budget_sample(
    df: DataFrame,
    budget: int = 2000,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ordered-prefix token budgeting: walk each source's documents in
    stable ``id_col`` order and keep them while the running whitespace-token
    total stays within ``budget`` -- "give me the first N tokens of every
    feed", the mirror image of x41's count balancing when the mix is
    specified in tokens (how training mixes are actually specified).
    Returns the per-source audit: docs kept, tokens kept, budget used.

    Scale notes: the cumulative sum is a window over ``source`` -- a
    deliberate ordered-scan semantic, so the shuffle is by the
    low-cardinality source key.  At 100 TB that key is skew-prone;
    the cluster plan is range-partition by (source, id) so each source's
    ordered scan spreads over many tasks and the running sum composes
    from per-range subtotals (two-pass prefix sum).  Only (source, id,
    n_tok) triples move -- the text dies in the scan-stage projection
    either way.
    """
    from pyspark.sql.window import Window

    from .text import ws_token_count

    toks = df.select(
        source_col, id_col, ws_token_count(text_col).cast("long").alias("n_tok")
    )
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("c", F.sum("n_tok").over(w))
    return (
        cum.where(F.col("c") <= budget)
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_tok").cast("long").alias("tokens_kept"),
            F.max("c").cast("long").alias("budget_used"),
        )
    )


def sequence_pack(
    df: DataFrame,
    seq_len: int = 2048,
    shards: int = 8,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a fixed-width training sequence: documents
    are walked in stable ``id_col`` order within a (lang, shard) stream and
    placed at their running-token start offset; ``seq_id = start DIV
    seq_len`` -- the greedy concat-and-chunk packing every LLM data loader
    performs, precomputed as a column so downstream writers can bucket by
    sequence.

    Scale design: the only shuffle is the window by (lang, shard).  The
    shard key (``id % shards``) exists purely to bound per-task state --
    one language at 100 TB would otherwise serialize through a single
    ordered partition; with shards the stream splits into ``shards``
    independent ordered scans that pack in parallel (packing quality is
    unaffected: sequences never straddle shards by construction).  Token
    counts ride along as one BIGINT; the text dies in the scan projection.
    All arithmetic is integer, so the assignment is bit-reproducible on
    any engine.
    """
    from pyspark.sql.window import Window

    from .text import ws_token_count

    toks = df.select(
        lang_col,
        id_col,
        (F.col(id_col) % shards).alias("shard"),
        ws_token_count(text_col).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy(lang_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("end_tok", F.sum("n_tok").over(w))
        .withColumn(
            "seq_id", F.expr(f"(end_tok - n_tok) DIV {seq_len}")
        )
        .select(id_col, lang_col, "shard", "n_tok", "seq_id")
    )


@register(
    "x47_sequence_pack",
    r"WITH toks AS ("
    r" SELECT lang, doc_id, doc_id % 8 AS shard,"
    r"  CAST(CASE WHEN length(trim(text)) = 0 THEN 0"
    r"  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)"
    r"  AS n_tok FROM documents), "
    r"cum AS ("
    r" SELECT lang, doc_id, shard, n_tok,"
    r"  SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id"
    r"   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok"
    r" FROM toks) "
    r"SELECT doc_id, lang, shard, n_tok,"
    r" CAST((end_tok - n_tok) // 2048 AS BIGINT) AS seq_id FROM cum",
    "sequence packing: greedy concat-and-chunk assignment of documents to "
    "fixed 2048-token training sequences per (lang, shard) stream",
)
def x47_sequence_pack(spark, sf_dir) -> DataFrame:
    return sequence_pack(t(spark, sf_dir, "documents"))


def quality_weighted_sample(
    df: DataFrame,
    buckets: int = 10_000,
    id_col: str = "doc_id",
    source_col: str = "source",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Keep each document with probability equal to its heuristic quality
    score -- high-quality text oversampled, junk mostly dropped -- but
    deterministically: survival is ``hash_bucket(id) < floor(quality *
    buckets)``, a pure function of the row, so the kept set is identical
    on any engine, partitioning, or retry (same audit story as x27/x41).
    Returns the per-source audit of the kept mix.

    Scale notes: zero shuffles before the final per-source aggregate; the
    quality expression and the survival predicate are one codegen'd
    scan-stage map.  Double-precision parity for the score is already
    pinned by x02 (hash-green), and ``floor`` of bit-identical doubles is
    bit-identical, so the threshold comparison is engine-portable despite
    being float-derived.
    """
    from .text import quality_score

    keep = hash_bucket(id_col, buckets) < F.floor(
        quality_score() * F.lit(float(buckets))
    )
    return (
        df.where(keep)
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(weight_col).cast("long").alias("chars_kept"),
        )
    )


def _duck_quality_gate(buckets: int) -> str:
    from .text import _duck_quality

    return (
        f"{_duck_bucket('doc_id', buckets)} < "
        f"floor(({_duck_quality()}) * {float(buckets)})"
    )


@register(
    "x48_quality_weighted_sample",
    "SELECT source, COUNT(*) AS n_kept, "
    " CAST(SUM(n_chars) AS BIGINT) AS chars_kept "
    f"FROM documents WHERE {_duck_quality_gate(10_000)} GROUP BY source",
    "quality-weighted deterministic sampling: each doc kept with "
    "probability = its quality score, reproducible across engines",
)
def x48_quality_weighted(spark, sf_dir) -> DataFrame:
    return quality_weighted_sample(t(spark, sf_dir, "documents"))


@register(
    "x43_token_budget_sample",
    r"WITH toks AS ("
    r" SELECT source, doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0"
    r"  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)"
    r"  AS n_tok FROM documents), "
    r"cum AS ("
    r" SELECT source, doc_id, n_tok,"
    r"  SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id"
    r"   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM toks) "
    r"SELECT source, COUNT(*) AS docs_kept,"
    r" CAST(SUM(n_tok) AS BIGINT) AS tokens_kept,"
    r" CAST(MAX(c) AS BIGINT) AS budget_used "
    r"FROM cum WHERE c <= 2000 GROUP BY source",
    "per-source ordered token budgeting: keep each feed's prefix while the "
    "running whitespace-token total fits the budget (token-denominated "
    "training-mix assembly)",
)
def x43_token_budget(spark, sf_dir) -> DataFrame:
    return token_budget_sample(t(spark, sf_dir, "documents"))


def _string_hash(col: str) -> str:
    """Spark SQL: engine-portable polynomial hash of a string (fold of
    31*h + ascii(char) mod 1e9+7) -- no dependence on either engine's
    builtin string hash."""
    return (
        f"aggregate(transform(sequence(1, length({col})), "
        f"i -> ascii(substring({col}, i, 1))), 0L, "
        f"(a, c) -> (a * 31 + c) % {MOD}L)"
    )


def _duck_string_hash(col: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, length({col}) + 1), "
        f"i -> ascii({col}[i]))), (a, c) -> (a * 31 + c) % {MOD})"
    )


def source_disjoint_split(
    df: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to train/val/test with the guarantee that a
    SOURCE never straddles splits: the split key is a portable hash of the
    source, not of the document.

    Why source-level: near-duplicate and boilerplate structure is
    heavily intra-source (same feed, same template).  A doc-level random
    split leaks that structure across train and eval -- the eval set then
    contains near-copies of training documents and overstates quality.
    Hashing the source sends every document of a feed to one side.

    Scale: pure map-side expression over the scan -- no shuffle, no
    source-list collection; the hash is exact integer arithmetic, so the
    assignment is reproducible on any engine and any partitioning.
    """
    bucket = f"({_string_hash(source_col)} % 100)"
    split = (
        f"CASE WHEN {bucket} < {train_pct} THEN 'train' "
        f"WHEN {bucket} < {train_pct + val_pct} THEN 'val' "
        f"ELSE 'test' END"
    )
    return df.select(
        F.col(id_col), F.col(source_col), F.expr(split).alias("split")
    )


@register(
    "x60_source_disjoint_split",
    "SELECT doc_id, source, CASE "
    f"WHEN ({_duck_string_hash('source')} % 100) < 80 THEN 'train' "
    f"WHEN ({_duck_string_hash('source')} % 100) < 90 THEN 'val' "
    "ELSE 'test' END AS split FROM documents",
    "leakage-safe train/val/test split: the split key hashes the SOURCE "
    "(portable integer arithmetic), so intra-feed near-duplicates can "
    "never straddle train and eval; zero-shuffle map-side assignment",
)
def x60_split(spark, sf_dir) -> DataFrame:
    return source_disjoint_split(t(spark, sf_dir, "documents"))
