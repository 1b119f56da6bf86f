"""Distributed ordered prefix aggregation (the two-pass prefix-scan
pattern).

A running aggregate over a global ORDER BY is the classic Spark scale
trap: ``Window.orderBy(col)`` with no partitioning plans as a
SINGLE-partition window -- one task sweeps the whole relation.  The
textbook fix (and what this module implements as a reusable primitive)
is the two-pass prefix scan:

1. ``repartitionByRange`` on the order column: partition boundaries are
   ordered, so "everything before row r" = "earlier partitions" +
   "earlier rows in r's partition".
2. A window PARTITIONED by the physical partition id computes the
   within-partition running aggregate -- every partition in parallel.
3. Per-partition totals (one row per partition -- bounded by cluster
   width, not data size) get an exclusive running aggregate on a single
   tiny partition and broadcast back as each partition's carry-in.

This is the cluster-scale plan the ordered operators document
(token-budget sampling x43, sequence packing x47 note it as their
100 TB shape); the skyline operator (x51) is built directly on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ordered_prefix_min(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = min of ``value_col`` over all rows STRICTLY
    before this row in ``order_col`` order (exclusive prefix min; null
    for the first row).

    Requires unique, non-null ``order_col`` values ("before" must be
    unambiguous); aggregate to distinct keys first -- which is what every
    caller wants anyway, and keeps the ranged relation skinny.
    """
    from pyspark.sql.window import Window

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("__local", F.min(value_col).over(w_in))
    parts = d.groupBy("__pid").agg(F.min(value_col).alias("__pmin"))
    w_p = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    carry = parts.withColumn("__carry", F.min("__pmin").over(w_p)).select(
        "__pid", "__carry"
    )
    # least() ignores nulls unless all inputs are null -- exactly the
    # "no earlier row anywhere" semantics wanted for the first row.
    return (
        d.join(F.broadcast(carry), "__pid")
        .withColumn(out_col, F.least("__local", "__carry"))
        .drop("__pid", "__local", "__carry")
    )
