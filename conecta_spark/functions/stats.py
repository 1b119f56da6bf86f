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


# x25 metric oracle: HLL++/KLL sketch INTERNALS are engine-specific, but
# their accuracy contract is portable.  The entry outputs the exact
# per-group statistics (count distinct, interpolated p95 -- both genuinely
# recomputed by DuckDB) plus per-sketch error-bound flags measured
# Spark-side and predicted TRUE by the oracle: HLL(rsd=0.01) within
# max(2, 5%) of the exact distinct count (measured rel err <= 0.0067 at
# sf0.001/0.01/0.1), approx_percentile(acc=10000) within 8% of the
# per-group value range of the exact p95 (measured <= 0.023 -- the
# discrete-vs-interpolated gap dominates on small groups).  A broken
# sketch path ships a FALSE flag and a red driver row.
@register(
    "x25_sketch_stats",
    "SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, "
    "round(quantile_cont(value, 0.95), 6) AS exact_p95, "
    "COUNT(*) AS n_events, TRUE AS users_ok, TRUE AS p95_ok "
    "FROM events GROUP BY event_type",
    "single-pass mergeable sketches (HLL distinct users + approx p95 per "
    "event_type -- the 100 TB path for distincts/quantiles), "
    "metric-oracled: exact stats cross-checked by DuckDB + measured "
    "sketch-error acceptance flags",
)
def x25_sketches(spark, sf_dir) -> DataFrame:
    e = t(spark, sf_dir, "events")
    # Two aggregation passes joined on the 5-row group key, NOT one: a
    # distinct aggregate in the same Aggregate as the sketches forces
    # Catalyst's Expand-based multi-phase plan, which drags the KLL/HLL
    # sketch buffers through the expanded row stream (measured 3.6-5.5 s
    # at sf0.1 vs 0.2 s per single-purpose pass).  Separated, each pass
    # is a single partial-combining aggregate and the join is broadcast.
    sk = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("au"),
        F.expr("percentile(value, 0.95)").alias("ep"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("ap"),
        F.max("value").alias("mx"),
        F.min("value").alias("mn"),
        F.count(F.lit(1)).alias("n_events"),
    )
    ex = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    agg = sk.join(F.broadcast(ex), "event_type")
    return agg.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        F.round("ep", 6).alias("exact_p95"),
        F.col("n_events").cast("long").alias("n_events"),
        (
            F.abs(F.col("au") - F.col("exact_users"))
            <= F.greatest(F.lit(2.0), 0.05 * F.col("exact_users"))
        ).alias("users_ok"),
        (
            F.abs(F.col("ap") - F.col("ep"))
            <= 0.08 * (F.col("mx") - F.col("mn")) + F.lit(1e-9)
        ).alias("p95_ok"),
    )
