"""Behavior + plan tests for the distributed prefix scan and the 2D
skyline built on it (x51).  Oracle parity is covered by the registry
sweep; these pin the semantics (dominance, ties, duplicates, nulls) and
the scale shape (no quadratic join, no full-data single-partition pass).
"""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from conecta_spark.operators.skyline import skyline_2d
from conecta_spark.plans.prefix import ordered_prefix_min
from conecta_spark.queries import REGISTRY, _load_extensions

from .test_plans import node_count, plan

_load_extensions()


def test_prefix_min_matches_serial_reference(spark):
    rng = random.Random(7)
    keys = rng.sample(range(10_000), 500)
    vals = [rng.randint(-1000, 1000) for _ in keys]
    df = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in zip(keys, vals)]
    )
    got = {
        r.k: r.pm
        for r in ordered_prefix_min(df, "k", "v", "pm", num_partitions=7).collect()
    }
    ordered = sorted(zip(keys, vals))
    running = None
    for k, v in ordered:
        assert got[k] == running, (k, got[k], running)
        running = v if running is None else min(running, v)


def test_prefix_min_is_exclusive_and_null_for_first(spark):
    df = spark.createDataFrame([Row(k=1, v=5), Row(k=2, v=3), Row(k=3, v=4)])
    got = {r.k: r.pm for r in ordered_prefix_min(df, "k", "v", "pm").collect()}
    assert got == {1: None, 2: 5, 3: 3}


def test_skyline_keeps_frontier_ties_and_duplicates(spark):
    pts = [
        (1, 10, 100.0),   # frontier
        (2, 10, 100.0),   # exact duplicate of 1 -- kept (ties don't dominate)
        (3, 10, 90.0),    # dominates 1/2? same x, smaller y -> yes
        (4, 20, 80.0),    # frontier (later, cheaper)
        (5, 20, 85.0),    # dominated in-group by 4
        (6, 30, 80.0),    # dominated out-group by 4 (same y, larger x)
        (7, 5, 200.0),    # frontier (earliest)
        (8, 40, 300.0),   # dominated by everything cheaper and earlier
    ]
    df = spark.createDataFrame(
        [Row(id=i, x=x, y=y) for i, x, y in pts]
    )
    got = {r.id for r in skyline_2d(df, "x", "y").collect()}
    # 1 and 2 are dominated by 3 (equal x, strictly smaller y)
    assert got == {3, 4, 7}


def test_skyline_exact_duplicates_all_kept(spark):
    df = spark.createDataFrame(
        [Row(id=1, x=1, y=1.0), Row(id=2, x=1, y=1.0), Row(id=3, x=2, y=2.0)]
    )
    got = {r.id for r in skyline_2d(df, "x", "y").collect()}
    assert got == {1, 2}


def test_skyline_null_dimensions_excluded(spark):
    df = spark.createDataFrame(
        [Row(id=1, x=None, y=0.0), Row(id=2, x=0, y=None), Row(id=3, x=5, y=5.0)]
    )
    got = {r.id for r in skyline_2d(df, "x", "y").collect()}
    assert got == {3}


def test_skyline_matches_quadratic_reference_on_random_points(spark):
    rng = random.Random(13)
    pts = [(i, rng.randint(0, 40), float(rng.randint(0, 40))) for i in range(300)]
    df = spark.createDataFrame([Row(id=i, x=x, y=y) for i, x, y in pts])
    got = {r.id for r in skyline_2d(df, "x", "y").collect()}
    want = {
        i
        for i, x, y in pts
        if not any(
            qx <= x and qy <= y and (qx < x or qy < y) for _, qx, qy in pts
        )
    }
    assert got == want


def test_skyline_plan_has_no_quadratic_join_or_global_point_window(spark, oracle_dir):
    p = plan(REGISTRY["x51_skyline_orders"].fn(spark, oracle_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # Every window over unbounded data is partitioned (by the range
    # partition id or the x group); the only unpartitioned window runs on
    # the per-partition carry relation, whose size is the cluster width.
    for ln in p.splitlines():
        if "Window" in ln and "Arguments" in ln:
            assert (
                "partitionBy" not in ln  # formatted plans spell specs inline
                or "__pid" in ln
                or "o_orderdate" in ln
            )


# -- N-dimensional skyline ---------------------------------------------------


def test_skyline_nd_matches_quadratic_reference_3d(spark):
    from conecta_spark.operators.skyline import skyline_nd

    rng = random.Random(29)
    pts = [
        (i, rng.randint(0, 12), rng.randint(0, 12), float(rng.randint(0, 12)))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        [Row(id=i, a=a, b=b, c=c) for i, a, b, c in pts]
    ).repartition(8)
    got = {r.id for r in skyline_nd(df, ["a", "b", "c"]).collect()}
    want = {
        i
        for i, a, b, c in pts
        if not any(
            qa <= a and qb <= b and qc <= c and (qa < a or qb < b or qc < c)
            for _, qa, qb, qc in pts
        )
    }
    assert got == want


def test_skyline_nd_keeps_exact_duplicates_and_drops_nulls(spark):
    from conecta_spark.operators.skyline import skyline_nd

    df = spark.createDataFrame(
        [
            Row(id=1, a=1, b=1.0),
            Row(id=2, a=1, b=1.0),      # exact duplicate: both kept
            Row(id=3, a=0, b=None),     # null dim: incomparable, excluded
            Row(id=4, a=2, b=2.0),      # dominated
        ]
    )
    got = {r.id for r in skyline_nd(df, ["a", "b"]).collect()}
    assert got == {1, 2}


def test_skyline_nd_partitioning_invariant(spark):
    """Local-skyline/merge must give the same frontier whatever the
    initial partitioning -- any global skyline point survives every local
    filter by definition."""
    from conecta_spark.operators.skyline import skyline_nd

    rng = random.Random(31)
    rows = [
        Row(id=i, a=rng.randint(0, 9), b=float(rng.randint(0, 9)))
        for i in range(200)
    ]
    one = {r.id for r in skyline_nd(spark.createDataFrame(rows).coalesce(1), ["a", "b"]).collect()}
    many = {r.id for r in skyline_nd(spark.createDataFrame(rows).repartition(16), ["a", "b"]).collect()}
    assert one == many


def test_skyline_nd_corner_prefilter_is_exact_with_ties(spark):
    """r12: the JVM corner pre-filter (prune against the mini-skyline of
    the 64 smallest-sum rows before the Python boundary) must keep exact
    frontier duplicates and match the quadratic reference on a corpus
    big enough to exercise both the pre-filter and the in-partition
    prune (>256 rows/partition)."""
    from conecta_spark.operators.skyline import skyline_nd

    rng = random.Random(37)
    pts = [
        (i, rng.randint(0, 40), rng.randint(0, 40), float(rng.randint(0, 40)))
        for i in range(3000)
    ]
    # duplicate a guaranteed-frontier point: both copies must survive
    pts.append((9001, 0, 0, 0.0))
    pts.append((9002, 0, 0, 0.0))
    df = spark.createDataFrame(
        [Row(id=i, a=a, b=b, c=c) for i, a, b, c in pts]
    ).repartition(4)
    got = {r.id for r in skyline_nd(df, ["a", "b", "c"]).collect()}
    want = {
        i
        for i, a, b, c in pts
        if not any(
            qa <= a and qb <= b and qc <= c and (qa < a or qb < b or qc < c)
            for _, qa, qb, qc in pts
        )
    }
    assert {9001, 9002} <= got
    assert got == want
