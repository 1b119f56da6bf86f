"""Deduplication operators (extension surface, SURVEY 2.4): exact,
n-gram-Jaccard, MinHash+LSH banding, SimHash -- each as a reusable
DataFrame transform plus a registered oracle-checked query over
``documents``.

Determinism & parity: the hash family is the engine's polyhash
(``(acc*31+cp) % 1e9+7``, functions/text.py) with affine permutations
``h -> ((2p+1)*h + p*p+7) % M`` -- pure integer arithmetic, so Spark and
DuckDB produce bit-identical signatures and the LSH pipeline itself is
oracle-checkable end-to-end (rare for LSH implementations).

Scale notes (100 TB):

* exact/minhash/simhash signatures are per-row JVM codegen maps -- no
  Python, no shuffle until the band join.
* the LSH candidate join shuffles on (band_idx, band_key): small keys,
  uniformly distributed by md5, so no skew; candidate pairs then re-join to
  the docs relation for exact verification rather than carrying shingle
  arrays through the shuffle.
* brute-force n-gram Jaccard is quadratic and kept only as the
  verify/baseline path, length-blocked to bound the pair count; at scale
  MinHash-LSH (here) or :func:`minhash_lsh_ml` (ml.feature, band-join under
  the hood via approxSimilarityJoin) is the real path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import MOD, duck_polyhash, polyhash
from ..queries import register, t

# -- expression builders (Spark SQL + DuckDB twins) -------------------------


def shingles_expr(col: str = "text", k: int = 5) -> str:
    return (
        f"array_distinct(transform(sequence(1, greatest(length(lower({col}))-{k - 1}, 1)), "
        f"i -> substr(lower({col}), i, {k})))"
    )


def duck_shingles(col: str = "text", k: int = 5) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(length(lower({col}))-{k - 1}, 1) + 1), "
        f"i -> substr(lower({col}), i, {k})))"
    )


def minhash_expr(shingle_hashes: str, num_perms: int = 16) -> str:
    """array<bigint> of MinHash signature values."""
    return (
        f"transform(sequence(0, {num_perms - 1}), p -> "
        f"array_min(transform({shingle_hashes}, h -> "
        f"((2*p+1)*h + p*p + 7) % {MOD})))"
    )


def duck_minhash(shingle_hashes: str, num_perms: int = 16) -> str:
    return (
        f"list_transform(range(0, {num_perms}), p -> "
        f"list_min(list_transform({shingle_hashes}, h -> "
        f"((2*p+1)*h + p*p + 7) % {MOD})))"
    )


SIMHASH_BITS = 32


def simhash_expr(col: str = "text") -> str:
    """32-bit SimHash over whitespace tokens of the lowercased text."""
    tok_hashes = (
        rf"transform(split(trim(lower({col})), '\\s+'), "
        rf"tk -> {polyhash('tk')})"
    )
    bit_vote = (
        f"aggregate({tok_hashes}, 0L, (a2, h) -> "
        f"a2 + (2 * ((h div shiftleft(1L, b)) % 2) - 1))"
    )
    return (
        f"aggregate(transform(sequence(0, {SIMHASH_BITS - 1}), b -> "
        f"IF({bit_vote} > 0, shiftleft(1L, b), 0L)), 0L, (acc, x) -> acc + x)"
    )


def duck_simhash(col: str = "text") -> str:
    tok_hashes = (
        rf"list_transform(regexp_split_to_array(trim(lower({col})), '\s+'), "
        rf"tk -> {duck_polyhash('tk')})"
    )
    bit_vote = (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({tok_hashes}, h -> "
        f"2 * ((h // (1::BIGINT << b)) % 2) - 1)), (a2, x) -> a2 + x)"
    )
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(0, {SIMHASH_BITS}), b -> "
        f"CASE WHEN {bit_vote} > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END)), "
        f"(acc, x) -> acc + x)"
    )


# -- DataFrame transforms ----------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content-hash groupBy: one surviving row (min id) per
    distinct text, with the duplicate count.  Map-side partial aggregation
    makes this one shuffle of (hash -> partial min/count)."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple = ("lang",),
    length_band: int = 100,
) -> DataFrame:
    """Brute-force near-dup pairs by character-``k``-gram Jaccard, blocked on
    ``block_cols`` + a text-length band (adjacent bands included so boundary
    pairs aren't lost)."""
    sh = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.expr(shingles_expr(text_col, k)).alias("sh"),
        (F.length(text_col) / F.lit(length_band)).cast("long").alias("lb"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond &= F.col(f"a.{c}") == F.col(f"b.{c}")
    cond &= (F.col("a.lb") - F.col("b.lb")).between(-1, 1)
    jac = (
        F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
        / F.size(F.array_union("a.sh", "b.sh")).cast("double")
    )
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    k: int = 5,
    num_perms: int = 16,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs with exact Jaccard verification.

    shingle -> polyhash -> ``num_perms`` affine-permutation minima ->
    ``bands`` band keys (md5 of each signature slice) -> band-key equi-join
    for candidates -> re-join to recompute exact shingle Jaccard >= threshold.
    """
    rows = bands and num_perms // bands
    sigs = df.select(
        F.col(id_col),
        F.expr(
            f"transform({shingles_expr(text_col, k)}, s -> {polyhash('s')})"
        ).alias("sh_hashes"),
    ).select(
        id_col,
        F.expr(minhash_expr("sh_hashes", num_perms)).alias("mh"),
    )
    banded = sigs.select(
        id_col,
        F.explode(F.expr(f"sequence(0, {bands - 1})")).alias("band_idx"),
        F.col("mh"),
    ).select(
        id_col,
        "band_idx",
        F.expr(
            f"md5(array_join(transform(slice(mh, band_idx * {rows} + 1, {rows}), "
            f"x -> cast(x as string)), '-'))"
        ).alias("band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    sh = df.select(
        F.col(id_col), F.expr(shingles_expr(text_col, k)).alias("sh")
    )
    jac = (
        F.size(F.array_intersect("sa.sh", "sb.sh")).cast("double")
        / F.size(F.array_union("sa.sh", "sb.sh")).cast("double")
    )
    return (
        cands.join(sh.alias("sa"), cands.doc_a == F.col(f"sa.{id_col}"))
        .join(sh.alias("sb"), cands.doc_b == F.col(f"sb.{id_col}"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(
        F.col(id_col), F.expr(simhash_expr(text_col)).alias("simhash")
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs: band on the signature's 4 bytes (a pair within
    ``max_hamming <= 8`` differing bits must agree on at least one byte when
    hamming < 4 bands), then exact hamming filter via bit_count(xor)."""
    sigs = simhash_signatures(df, text_col, id_col)
    banded = sigs.select(
        id_col,
        "simhash",
        F.explode(F.expr("sequence(0, 3)")).alias("band_idx"),
    ).withColumn(
        "band_key", F.expr("(simhash div shiftleft(1L, band_idx * 8)) % 256")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def minhash_lsh_ml(
    df: DataFrame,
    threshold: float = 0.5,
    num_features: int = 1 << 18,
    num_hash_tables: int = 8,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Scale-path MinHash via pyspark.ml (HashingTF shingle vectors +
    MinHashLSH.approxSimilarityJoin).  Not SQL-expressible -> rows-only
    correctness check; recall vs the exact path is covered in tests."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(
        F.col(id_col), F.expr(shingles_expr(text_col, k)).alias("sh")
    ).where(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feat = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, 1.0 - threshold, distCol="jaccard_dist")
    return (
        joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            (F.lit(1.0) - F.col("jaccard_dist")).alias("jaccard"),
        )
    )


# -- registered queries ------------------------------------------------------


@register(
    "x05_dedup_exact",
    "SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_doc_id, "
    "COUNT(*) AS n_dups FROM documents GROUP BY text",
    "exact dedup: content-hash groupBy keeping min doc_id",
)
def x05_dedup_exact(spark, sf_dir) -> DataFrame:
    return dedup_exact(t(spark, sf_dir, "documents"))


@register(
    "x06_dedup_ngram_jaccard",
    "WITH sh AS (SELECT doc_id, lang, "
    f" {duck_shingles('text', 3)} AS sh, "
    " (length(text) // 100)::BIGINT AS lb FROM documents) "
    "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    " len(list_intersect(a.sh, b.sh))::DOUBLE / "
    " len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE AS jaccard "
    "FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id "
    " AND a.lb - b.lb BETWEEN -1 AND 1 "
    "WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / "
    " len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE >= 0.8",
    "brute-force 3-gram Jaccard near-dup pairs (length-blocked baseline)",
)
def x06_ngram_jaccard(spark, sf_dir) -> DataFrame:
    return ngram_jaccard_pairs(t(spark, sf_dir, "documents"), threshold=0.8, k=3)


_DUCK_SH_HASHES = (
    f"list_transform({duck_shingles()}, s -> {duck_polyhash('s')})"
)

_DUCK_MH_SIGS = (
    "WITH sigs AS (SELECT doc_id, "
    f"{duck_minhash(_DUCK_SH_HASHES)}"
    " AS mh FROM documents), "
    "banded AS (SELECT doc_id, j AS band_idx, "
    " md5(array_to_string(mh[j*4+1 : j*4+4], '-')) AS band_key "
    " FROM sigs CROSS JOIN range(0, 4) AS r(j)), "
    "cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    " FROM banded a JOIN banded b ON a.band_idx = b.band_idx "
    " AND a.band_key = b.band_key AND a.doc_id < b.doc_id), "
    f"sh AS (SELECT doc_id, {duck_shingles()} AS sh FROM documents) "
    "SELECT doc_a, doc_b, "
    " len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
    " len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE AS jaccard "
    "FROM cands JOIN sh sa ON cands.doc_a = sa.doc_id "
    "JOIN sh sb ON cands.doc_b = sb.doc_id "
    "WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
    " len(list_distinct(list_concat(sa.sh, sb.sh)))::DOUBLE >= 0.5"
)


@register(
    "x07_dedup_minhash_lsh",
    _DUCK_MH_SIGS,
    "MinHash(16 perms) + LSH(4 bands) near-dup pairs, exact-Jaccard verified",
)
def x07_minhash_lsh(spark, sf_dir) -> DataFrame:
    return minhash_lsh_pairs(t(spark, sf_dir, "documents"), threshold=0.5)


@register(
    "x08_dedup_simhash",
    f"SELECT doc_id, {duck_simhash()} AS simhash FROM documents",
    "32-bit SimHash signatures over whitespace tokens",
)
def x08_simhash(spark, sf_dir) -> DataFrame:
    return simhash_signatures(t(spark, sf_dir, "documents"))


@register(
    "x09_dedup_minhash_ml",
    None,  # pyspark.ml LSH is not SQL-expressible -> rows-only check
    "scale-path MinHashLSH via ml.feature approxSimilarityJoin",
)
def x09_minhash_ml(spark, sf_dir) -> DataFrame:
    return minhash_lsh_ml(t(spark, sf_dir, "documents"), threshold=0.5)
