"""Salted aggregation/join must produce exactly the unsalted results."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conecta_spark.plans.skew import (
    salted_aggregate,
    salted_replicated_join,
    with_salt,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key -- the hot-key shape."""
    hot = spark.range(9000).select(
        F.lit(1).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    rest = spark.range(1000).select(
        (F.col("id") % 50 + 2).alias("k"), F.col("id").cast("double").alias("v")
    )
    return hot.unionAll(rest).cache()


def test_salt_is_deterministic_and_bounded(spark, skewed):
    a = with_salt(skewed, 8).groupBy("_salt").count().collect()
    b = with_salt(skewed, 8).groupBy("_salt").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["_salt"] < 8 for r in a)
    assert len(a) == 8  # hot key actually spreads across salts


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.s, r.c, r.mx)
        for r in skewed.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.k): (r.s, r.c, r.mx)
        for r in salted_aggregate(
            skewed,
            keys=["k"],
            partial_aggs=[
                F.sum(F.col("v").cast("decimal(18,4)")).alias("ps"),
                F.count(F.lit(1)).alias("pc"),
                F.max("v").alias("pmx"),
            ],
            final_aggs=[
                F.sum("ps").cast("double").alias("s"),
                F.sum("pc").alias("c"),
                F.max("pmx").alias("mx"),
            ],
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.range(60).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    plain = sorted(
        map(tuple, skewed.join(dim, "k").select("k", "v", "name").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_replicated_join(skewed, dim, on="k", n_salts=8)
            .select("k", "v", "name")
            .collect(),
        )
    )
    assert salted == plain
