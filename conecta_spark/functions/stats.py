"""Distribution statistics over the events/lineitem tables: exact
percentiles (oracle-checked) and sketch-based approximations (HLL distinct,
approximate quantiles -- rows-only, since sketch internals differ across
engines by design).

Scale notes (100 TB):

* exact percentile is a full sort-per-group in Spark's ``percentile``
  aggregate -- fine for bounded groups (per event_type here), wrong tool
  for billions per group; that is what the sketch variant is for.
* ``approx_percentile`` (KLL-ish) and ``approx_count_distinct`` (HLL++)
  are single-pass, mergeable, fixed-memory sketches -- the only honest way
  to do quantiles/distincts at 100 TB.  They are registered rows-only
  because their estimates are engine-specific (deterministic per engine,
  not portable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries import register, t


def exact_percentiles(
    df: DataFrame, value_col: str, group_cols: tuple, probs: tuple = (0.5, 0.95)
) -> DataFrame:
    cols = [
        F.expr(f"percentile({value_col}, {p})").alias(
            f"p{str(p).replace('0.', '')}"
        )
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(*cols)


@register(
    "x24_exact_percentiles",
    "SELECT event_type, "
    "quantile_cont(value, 0.5) AS p5, "
    "quantile_cont(value, 0.95) AS p95 "
    "FROM events GROUP BY event_type",
    "exact per-group percentiles (linear interpolation, both engines)",
)
def x24_percentiles(spark, sf_dir) -> DataFrame:
    return exact_percentiles(
        t(spark, sf_dir, "events"), "value", ("event_type",), (0.5, 0.95)
    )


@register(
    "x25_sketch_stats",
    None,  # HLL++/KLL sketch estimates are engine-specific -> rows-only
    "single-pass mergeable sketches: HLL distinct users + approx p95 "
    "per event_type (the 100 TB path for distincts/quantiles)",
)
def x25_sketches(spark, sf_dir) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("approx_p95"),
        F.count(F.lit(1)).alias("c"),
    )
