"""Temporal join operators Spark lacks natively: as-of join and interval
(range) join.  Both are compositions of existing DataFrame ops -- no UDF,
no custom strategy -- chosen for their shuffle behavior at scale.

As-of join (union + window): tag both relations, union them, and take the
last right-side row per key over an ordered window.  This is the standard
scale-out as-of: ONE shuffle on the key, state linear in rows, no join
explosion, no per-row probe.  A sort-merge "p.ts <= e.ts" theta join would
produce every prior row per probe (quadratic) before aggregating it away.

Interval join (bucketize + equi-join): map each point to a coarse time
bucket, explode each probe to its neighboring buckets, equi-join on
(key, bucket), then apply the exact range predicate.  Candidates are
bounded by bucket co-residency instead of the full per-key cross product --
the same blocking idea as the dedup length bands.

Both are oracle-checked: DuckDB has a native ASOF JOIN (x22) and evaluates
the interval predicate as a plain theta join (x23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries import epoch_micros, register, t


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "tsu",
    right_ts: str = "tsu",
    right_cols: tuple = (),
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``by`` key: ``direction="backward"`` takes the most recent right row
    with ``right.ts <= left.ts`` (inclusive), ``"forward"`` the earliest
    with ``right.ts >= left.ts``.

    Both directions are the same union+window plan -- one shuffle on the
    key, state linear in rows -- differing only in the window's traversal
    order.  ``right`` must be unique per (by, ts) -- pre-aggregate it if
    not, or ties become nondeterministic.  Right rows sort before left
    rows at equal timestamps, so a right row at exactly the left timestamp
    matches in either direction.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns if c not in (by, left_ts)]
    rcols = list(right_cols) or [
        c for c in right.columns if c not in (by, right_ts)
    ]
    l_tagged = left.select(
        F.col(by),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
        F.lit(None).cast("long").alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(by),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        F.col(right_ts).cast("long").alias("_r_ts"),
    )
    from pyspark.sql.window import Window

    order = (
        [F.col("_ts").asc(), F.col("_tag").asc()]
        if direction == "backward"
        else [F.col("_ts").desc(), F.col("_tag").asc()]
    )
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        by,
        "_ts",
        "_tag",
        *lcols,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in rcols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_r_ts"),
    )
    return filled.where(F.col("_tag") == 1).select(
        by,
        F.col("_ts").alias(left_ts),
        *lcols,
        *[F.col(f"_r_{c}").alias(c) for c in rcols],
        F.col("_r_ts").alias(f"{right_ts}_matched"),
    )


def interval_join(
    points: DataFrame,
    anchors: DataFrame,
    by: str,
    radius_us: int,
    point_ts: str = "tsu",
    anchor_ts: str = "tsu",
) -> DataFrame:
    """All (point, anchor) pairs within the same ``by`` key whose timestamps
    differ by at most ``radius_us`` -- a symmetric range join.

    Buckets of width ``radius_us`` bound the candidates: a qualifying pair
    is always in the same or adjacent buckets, so exploding each point to
    its 3 neighboring buckets and equi-joining on (by, bucket) finds every
    pair exactly once (the anchor side keeps its true bucket)."""
    p = points.select(
        F.col(by),
        F.col(point_ts).alias("p_ts"),
        F.explode(
            F.expr(
                f"array({point_ts} div {radius_us} - 1, "
                f"{point_ts} div {radius_us}, "
                f"{point_ts} div {radius_us} + 1)"
            )
        ).alias("bucket"),
    )
    # Integer `div`, matching the point side: double division is inexact for
    # int64-scale timestamps (> 2^53 us) and could land the anchor one bucket
    # off, silently dropping a qualifying pair outside the point's +-1 span.
    a = anchors.select(
        F.col(by).alias("_aby"),
        F.col(anchor_ts).alias("a_ts"),
        F.expr(f"{anchor_ts} div {radius_us}").alias("bucket"),
    )
    return (
        p.join(a, (p[by] == a._aby) & (p.bucket == a.bucket))
        .where(F.abs(F.col("p_ts") - F.col("a_ts")) <= radius_us)
        .select(by, "p_ts", "a_ts")
        .distinct()
    )


# -- registered queries ------------------------------------------------------


@register(
    "x22_asof_join",
    "WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu "
    " FROM events WHERE event_type = 'error'), "
    "p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, "
    " MAX(event_id) AS purchase_event_id FROM events "
    " WHERE event_type = 'purchase' GROUP BY 1, 2) "
    "SELECT e.user_id, e.tsu, e.event_id, p.purchase_event_id, "
    " p.tsu AS tsu_matched "
    "FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND p.tsu <= e.tsu",
    "as-of join: each error event attributed to the user's most recent "
    "prior purchase (union+window form; DuckDB native ASOF JOIN oracle)",
)
def x22_asof(spark, sf_dir) -> DataFrame:
    events = t(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        epoch_micros(events).alias("tsu"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "tsu", "event_id"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "tsu")
        .agg(F.max("event_id").alias("purchase_event_id"))
    )
    return asof_join(
        errors, purchases, by="user_id", right_cols=("purchase_event_id",)
    )


@register(
    "x23_interval_join",
    "WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, "
    " event_type FROM events) "
    "SELECT DISTINCT p.user_id, p.tsu AS p_ts, a.tsu AS a_ts "
    "FROM e p JOIN e a ON p.user_id = a.user_id "
    " AND p.event_type = 'purchase' AND a.event_type = 'error' "
    " AND abs(p.tsu - a.tsu) <= 300000000",
    "interval join: purchase/error event pairs within 5 minutes per user "
    "(bucketized equi-join; plain theta-join oracle)",
)
def x23_interval(spark, sf_dir) -> DataFrame:
    events = t(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        epoch_micros(events).alias("tsu"),
        "event_type",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("tsu")
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("tsu")
    )
    out = interval_join(
        purchases, errors, by="user_id", radius_us=300_000_000
    )
    return out.select("user_id", "p_ts", "a_ts")


@register(
    "x38_asof_forward",
    "WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu "
    " FROM events WHERE event_type = 'error'), "
    "p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, "
    " MAX(event_id) AS next_purchase_event_id FROM events "
    " WHERE event_type = 'purchase' GROUP BY 1, 2) "
    "SELECT e.user_id, e.tsu, e.event_id, p.next_purchase_event_id, "
    " p.tsu AS tsu_matched "
    "FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND p.tsu >= e.tsu",
    "forward as-of join: each error attributed to the user's NEXT purchase "
    "at-or-after it (same union+window plan as x22, traversed descending; "
    "DuckDB native forward ASOF oracle)",
)
def x38_asof_forward(spark, sf_dir) -> DataFrame:
    events = t(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        "user_id",
        "event_type",
        epoch_micros(events).alias("tsu"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "tsu", "event_id"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "tsu")
        .agg(F.max("event_id").alias("next_purchase_event_id"))
    )
    return asof_join(
        errors,
        purchases,
        by="user_id",
        right_cols=("next_purchase_event_id",),
        direction="forward",
    )
