"""Skyline (Pareto frontier) queries, Spark-first.

The skyline of a point set under "minimize every dimension" keeps the
points no other point dominates (<= everywhere, < somewhere) -- the
multi-objective answer to "cheapest AND earliest" that no single ORDER BY
can express.  Literature context: skyline integration into Spark SQL is
an active line of work (EDBT 2023, PAPERS.md); this module re-expresses
the 2D case with stock DataFrame operators instead of an engine
extension.

The naive form is a quadratic dominance anti-join (the DuckDB oracle
keeps exactly that form -- NOT EXISTS over the self-join -- as the
semantic contract).  The Spark plan is the O(n log n) sorted sweep,
distributed:

* collapse points to one row per x value with the group's min y (the
  only candidate a group can contribute);
* exclusive prefix-min of those group minima in x order via the two-pass
  range-partitioned prefix scan (:mod:`..plans.prefix`) -- every
  partition sweeps in parallel; the only serial step is one tiny window
  over per-partition totals, bounded by cluster width;
* a point survives iff no strictly-smaller-x group reaches a y <= its
  own (out-group dominance) and no same-x point has a strictly smaller
  y (in-group dominance).  Exact duplicates tie and are all kept, per
  standard skyline semantics.

Shuffles: the group-by on x, the skinny ranged group relation, one join
back to the points (broadcast when groups are few), and the per-x
window.  Nothing quadratic anywhere, and no single-partition pass over
the full point set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.prefix import ordered_prefix_min
from ..queries import register, t


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows of ``df`` on the minimize-(x, y) Pareto frontier.  Rows with
    a null in either dimension are incomparable and excluded."""
    from pyspark.sql.window import Window

    pts = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    grp = pts.groupBy(x_col).agg(F.min(y_col).alias("__gy"))
    grp = ordered_prefix_min(grp, x_col, "__gy", "__run").select(
        x_col, "__run"
    )
    j = pts.join(grp, x_col)
    w_in = (
        Window.partitionBy(x_col)
        .orderBy(y_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = j.withColumn("__prior_y", F.min(y_col).over(w_in))
    return (
        j.where(
            (F.col("__run").isNull() | (F.col("__run") > F.col(y_col)))
            & (
                F.col("__prior_y").isNull()
                | (F.col("__prior_y") >= F.col(y_col))
            )
        )
        .drop("__run", "__prior_y")
    )


@register(
    "x51_skyline_orders",
    "SELECT p.o_orderkey, p.o_orderdate, p.o_totalprice FROM orders p "
    "WHERE p.o_orderdate IS NOT NULL AND p.o_totalprice IS NOT NULL "
    "AND NOT EXISTS (SELECT 1 FROM orders q WHERE "
    " q.o_orderdate IS NOT NULL AND q.o_totalprice IS NOT NULL "
    " AND q.o_orderdate <= p.o_orderdate "
    " AND q.o_totalprice <= p.o_totalprice "
    " AND (q.o_orderdate < p.o_orderdate "
    "  OR q.o_totalprice < p.o_totalprice))",
    "skyline / Pareto frontier: earliest-and-cheapest orders under "
    "2D dominance -- distributed sorted sweep (range-partitioned prefix "
    "scan) vs the oracle's quadratic NOT EXISTS",
)
def x51_skyline(spark, sf_dir) -> DataFrame:
    return skyline_2d(
        t(spark, sf_dir, "orders"), "o_orderdate", "o_totalprice"
    ).select("o_orderkey", "o_orderdate", "o_totalprice")
