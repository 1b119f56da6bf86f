"""Skew-mitigation utilities: salted aggregation and salted joins.

AQE's skew-join splitting handles byte-skewed sort-merge joins, but two
shapes still need manual salting at 100 TB:

* **hot-key aggregation** -- one key receiving a large share of rows makes
  one reducer the straggler.  ``salted_aggregate`` splits each key into
  ``n_salts`` sub-keys for the first (parallel) aggregation, then combines
  the partials in a second, tiny aggregation.  Works for any algebraic
  aggregate (sum/count/min/max) where partials merge with the same op --
  the caller supplies the merge expressions.
* **hot-key join against a small relation** -- ``salted_broadcast_free_join``
  replicates the small side to every salt and spreads the big side's hot
  keys across ``n_salts`` shuffle partitions.  Row-content-hash salting
  keeps the result deterministic.

These are the explicit versions of what the dedup/simsearch operators do
inline (band salting, block grids); exposed so pipelines can apply the same
medicine to their own hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Widen a CPU-dense relation to at least ``parts`` partitions.

    Partitioning decisions everywhere else in Spark are *byte*-driven: a
    parquet scan splits by row group / ``maxPartitionBytes``, and AQE
    coalesces shuffle partitions toward a byte target.  Both are blind to
    per-row compute cost, so a small-bytes relation about to run heavy
    per-row work (signature hashing, candidate-pair verification, Arrow
    batch UDFs) can land on one core while 31 idle.  At real scale inputs
    are wide enough that this returns ``df`` unchanged -- the repartition
    only fires on the narrow-input case, and costs one shuffle of the
    skinny relation it widens.
    """
    target = parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_salt(df: DataFrame, n_salts: int, cols: tuple | None = None) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts) from row-content hash."""
    cols = cols or tuple(df.columns)
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot keys.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs`` merge the
    partials per key (e.g. partial ``sum(x) as s`` merges with
    ``sum(s) as s``).  The first shuffle spreads each hot key over
    ``n_salts`` reducers; the second shuffle moves only n_keys*n_salts rows.
    """
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_replicated_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big relation to a small one without broadcasting.

    The big side gets a content-hash salt; the small side is exploded to
    all ``n_salts`` salt values, so the shuffle key (on, salt) spreads each
    hot key over ``n_salts`` partitions.  Shuffle volume of the small side
    grows by ``n_salts`` -- use when the small side is too big to broadcast
    but far smaller than the big side."""
    b = with_salt(big, n_salts, cols=tuple(c for c in big.columns if c != on))
    s = small.withColumn(
        "_salt",
        F.explode(F.expr(f"sequence(0, {n_salts - 1})")),
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")
