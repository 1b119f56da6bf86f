"""Z-order (Morton) clustering keys for multi-column data skipping.

``sinks.write_parquet(cluster_by=...)`` narrows parquet row-group min/max
stats for ONE column; a query filtering on a different column still scans
everything.  Z-ordering interleaves the bits of several columns into one
sort key so that sorting by the key co-locates rows that are close in
EVERY dimension -- row-group stats become narrow for all participating
columns at once, and predicate scans on any of them skip row groups.
This is the layout trick behind Delta Lake's OPTIMIZE ZORDER BY and
time-series stores' space-filling-curve layouts.

Design constraints, in the repo's parity discipline:

* **Exact integer arithmetic only.**  Each column is scaled to
  ``[0, 2^bits)`` with BIGINT multiply + integer division against a
  min/max range, then interleaved with shifts and masks -- no doubles
  anywhere, so the same formula in DuckDB produces bit-identical keys
  (registry entry x57).
* **The range probe is planner metadata.**  min/max per column come from
  one tiny aggregate (parquet footer-only when the column is scanned
  bare -- the same O8 metadata-probe shape as read_sql's partition
  planning).  The driver-side collect is one row, mirroring the
  reference's fetch_min_max step (conecta-core/src/source/postgres.rs:556).
* **Scale.**  The key is one BIGINT column computed map-side; writing
  z-ordered output is ``repartitionByRange(key)`` or a local
  ``sortWithinPartitions(key)`` -- the same cost as any cluster_by.
  Skew in the key space maps to skew in the data; ranges come from real
  min/max so the curve always covers the actual domain.

Overflow bound: ``(col - mn) * (2^bits - 1)`` must fit in int64, i.e.
``(mx - mn) < 2^(63 - bits)``; with the default 16 bits that allows
column ranges up to ~1.4e14 -- beyond any key domain in the testdata.
Total key width ``bits * len(cols)`` must stay <= 63.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..queries import register, t


def _scaled(col: str, mn: int, mx: int, bits: int) -> str:
    """Spark SQL: ``col`` scaled to [0, 2^bits) by exact BIGINT math.
    Nulls clamp to the minimum (sort first, prune like the min)."""
    top = (1 << bits) - 1
    if mx <= mn:  # constant column: every row scales to 0
        return "0L"
    return (
        f"((coalesce(CAST({col} AS BIGINT), {mn}L) - {mn}L) * {top}L)"
        f" DIV {mx - mn}L"
    )


def zorder_expr(
    cols: list[str], mins: list[int], maxs: list[int], bits: int = 16
) -> str:
    """Spark SQL expression: Morton interleave of ``cols``.  Output bit
    ``p`` is bit ``p div n`` of scaled column ``p mod n``.

    Deliberately UNROLLED into a flat sum of shift/mask terms: a
    higher-order ``aggregate(sequence(...))`` form never enters
    whole-stage codegen (interpreted per row -- the lesson that cost x19
    and x40 seconds each earlier this round), while the flat sum compiles
    and its repeated scaled-column subexpressions fall to common
    subexpression elimination."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"zorder key too wide: {n} cols * {bits} bits > 63")
    scaled = [
        _scaled(c, mn, mx, bits) for c, mn, mx in zip(cols, mins, maxs)
    ]
    terms = [
        f"shiftleft(shiftright({scaled[p % n]}, {p // n}) & 1L, {p})"
        for p in range(n * bits)
    ]
    return "(" + " + ".join(terms) + ")"


def duck_zorder(
    cols: list[str], mins: list[int], maxs: list[int], bits: int = 16
) -> str:
    """DuckDB twin of :func:`zorder_expr` -- identical integer arithmetic."""
    n = len(cols)
    top = (1 << bits) - 1

    def ds(c, mn, mx):
        if mx <= mn:
            return "(0::BIGINT)"
        return (
            f"(((coalesce(CAST({c} AS BIGINT), {mn}) - {mn}) * {top})"
            f" // {mx - mn})"
        )

    scaled = [ds(c, mn, mx) for c, mn, mx in zip(cols, mins, maxs)]
    terms = [
        f"((({scaled[p % n]} >> {p // n}) & 1) << {p})"
        for p in range(n * bits)
    ]
    return "(" + " + ".join(terms) + ")"


def column_ranges(df: DataFrame, cols: list[str]) -> tuple[list[int], list[int]]:
    """One-row min/max probe over ``cols`` (parquet footer-only when the
    plan allows aggregate pushdown -- the O8 metadata shape)."""
    aggs: list[Column] = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("long")))
        aggs.append(F.max(F.col(c).cast("long")))
    row = df.agg(*aggs).collect()[0]
    mins = [int(row[2 * i]) for i in range(len(cols))]
    maxs = [int(row[2 * i + 1]) for i in range(len(cols))]
    return mins, maxs


def with_zorder_key(
    df: DataFrame,
    cols: list[str] | tuple,
    bits: int = 16,
    key_col: str = "_zkey",
) -> DataFrame:
    """``df`` plus a BIGINT Morton key over ``cols`` (integer-typed
    columns; ranges probed from the data)."""
    cols = list(cols)
    mins, maxs = column_ranges(df, cols)
    return df.withColumn(key_col, F.expr(zorder_expr(cols, mins, maxs, bits)))


# Registered on lineitem's two independent key columns.  Ranges are pinned
# literals (not probed) so the oracle SQL is self-contained; the driver
# regenerates testdata per scale factor, so the range is taken generously
# wide and identically on both sides -- key values only need to MATCH, not
# to be tight.  8 bits * 2 cols keeps the demo readable.
_ZCOLS = ["l_orderkey", "l_partkey"]
_ZMIN = [1, 1]
_ZMAX = [6000000, 2000000]
_ZBITS = 8


@register(
    "x57_zorder_key",
    "SELECT l_orderkey, l_linenumber, "
    + duck_zorder(_ZCOLS, _ZMIN, _ZMAX, _ZBITS)
    + " AS zkey FROM lineitem",
    "Morton/Z-order clustering key over (l_orderkey, l_partkey): exact "
    "BIGINT scale-and-interleave, the multi-column data-skipping sort key "
    "(sorting by it narrows parquet row-group stats for BOTH columns)",
)
def x57_zorder(spark, sf_dir) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(zorder_expr(_ZCOLS, _ZMIN, _ZMAX, _ZBITS)).alias("zkey"),
    )


def morton_key(values: list[int], bits: int) -> int:
    """Pure-Python reference interleave (test oracle): bit ``p`` of the
    key is bit ``p // n`` of ``values[p % n]``."""
    n = len(values)
    key = 0
    for p in range(n * bits):
        key |= ((values[p % n] >> (p // n)) & 1) << p
    return key


def morton_decode(key: int, n: int, bits: int) -> list[int]:
    """Inverse of :func:`morton_key` -- recovers the scaled per-column
    values from a key.  Used to reason about file boundaries: a z-ordered
    file covering keys [a, b] covers column i values within the decoded
    bounding box of that key range."""
    vals = [0] * n
    for p in range(n * bits):
        vals[p % n] |= ((key >> p) & 1) << (p // n)
    return vals
