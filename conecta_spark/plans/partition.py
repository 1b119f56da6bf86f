"""Partition planning: config validation, mode inference, range splitting.

Re-expresses the reference planner's semantics (conecta-core/src/partition.rs)
as pure Python.  These functions are Spark-free and unit-testable; the Spark
readers in :mod:`conecta_spark.sources` consume their output.

Semantics parity notes (citations into /root/reference):

* Validation rules mirror ``PartitionConfig::new`` (partition.rs:20-91):
  empty query list, multi-query + any ``partition_*`` option, ``partition_num``
  without ``partition_on``, ``partition_range`` without ``partition_on``, and
  ``partition_range`` with ``min >= max`` are all rejected (panics there,
  ``ValueError`` here).
* Mode inference mirrors partition.rs:75-79 and metadata.rs:5-24.
* ``bounds()`` mirrors the uniform float-stride split of partition.rs:93-114
  (half-open interior ranges, inclusive last range absorbing the rounding
  remainder; expected values for (0, 10, 3) are (0,3),(3,6),(6,10) per the
  reference's own tests, partition.rs:143-158).  DIVERGENCE, deliberate: the
  reference computes ``stop = trunc(start + step)`` from the *truncated*
  start, which can leave gaps between partitions (e.g. (0,10,4) yields
  [0,2),[2,4),[5,7),[7,10] -- the value 4 falls in no partition and the row
  is silently dropped).  We compute ``stop_i = start_{i+1}`` so partitions
  are contiguous and the union is lossless; the reference's documented test
  vectors are unaffected.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class QueryPartitioningMode(enum.Enum):
    """How the read fans out (metadata.rs:5-16)."""

    ONE_PARTITIONED_QUERY = "OnePartitionedQuery"      # engine splits one query
    PARTITIONED_QUERIES = "PartitionedQueries"         # user passed >1 query
    ONE_UNPARTITIONED_QUERY = "OneUnpartitionedQuery"  # single serial read


class NeededMetadata(enum.Enum):
    """Which pre-flight aggregates the planner must push down
    (metadata.rs:18-24)."""

    COUNT = "Count"
    COUNT_AND_MIN_MAX = "CountAndMinMax"


@dataclass
class PartitionConfig:
    """Validated read configuration (partition.rs:6-18).

    ``preallocation`` is accepted for API parity but is a no-op on Spark:
    executor buffer sizing is Tungsten's job (SURVEY 4.2).
    """

    query: list[str]
    partition_on: str | None = None
    partition_num: int | None = None
    partition_range: tuple[int, int] | None = None
    preallocation: bool = False
    needed_metadata: NeededMetadata = field(init=False)
    mode: QueryPartitioningMode = field(init=False)

    def __post_init__(self) -> None:
        if isinstance(self.query, str):
            self.query = [self.query]
        if not self.query:
            raise ValueError("must pass some queries!")
        has_opts = (
            self.partition_num is not None
            or self.partition_on is not None
            or self.partition_range is not None
        )
        if has_opts and len(self.query) > 1:
            raise ValueError(
                "Double partition scheme: several queries (user-defined "
                "partitioning) cannot be combined with partition_* options "
                "(engine-defined partitioning); pass one or the other."
            )
        if self.partition_num is not None and self.partition_on is None:
            raise ValueError(
                f"partition_num={self.partition_num} requires partition_on; "
                "pass a column name."
            )
        if self.partition_range is not None and self.partition_on is None:
            raise ValueError("partition_range requires partition_on.")
        if self.partition_range is not None:
            mn, mx = self.partition_range
            if mn >= mx:
                raise ValueError(
                    f"partition_range is (min, max) with min < max; "
                    f"got min={mn}, max={mx}."
                )
        if (
            self.partition_range is None
            and self.partition_num is not None
            and self.partition_on is not None
        ):
            self.needed_metadata = NeededMetadata.COUNT_AND_MIN_MAX
        else:
            self.needed_metadata = NeededMetadata.COUNT
        if len(self.query) > 1:
            self.mode = QueryPartitioningMode.PARTITIONED_QUERIES
        elif self.partition_on is not None and self.partition_num is not None:
            self.mode = QueryPartitioningMode.ONE_PARTITIONED_QUERY
        else:
            self.mode = QueryPartitioningMode.ONE_UNPARTITIONED_QUERY

    def to_dict(self) -> dict:
        return {
            "query": list(self.query),
            "partition_on": self.partition_on,
            "partition_num": self.partition_num,
            "partition_range": list(self.partition_range)
            if self.partition_range
            else None,
            "preallocation": self.preallocation,
            "needed_metadata_from_source": self.needed_metadata.value,
            "query_partition_mode": self.mode.value,
        }


def bounds(mn: int, mx: int, n: int) -> list[tuple[int, int]]:
    """Split ``[mn, mx]`` into ``n`` contiguous integer ranges.

    Interior ranges are half-open ``[start, stop)``; the last is closed
    ``[start, mx]`` and absorbs the rounding remainder (partition.rs:93-114,
    minus its gap bug -- see module docstring).
    """
    if mn >= mx:
        raise ValueError("min must be less than max")
    if n <= 0:
        raise ValueError("n must be greater than 0")
    step = (mx - mn) / n
    out: list[tuple[int, int]] = []
    for i in range(n):
        start = int(mn + step * i)
        stop = mx if i == n - 1 else int(mn + step * (i + 1))
        out.append((start, stop))
    return out


def bound_predicate(column: str, bound: tuple[int, int], is_last: bool) -> str:
    """SQL predicate for one partition bound (postgres.rs:488-510 shape)."""
    op = "<=" if is_last else "<"
    return f"{column} >= {bound[0]} and {column} {op} {bound[1]}"


def wrap_query_with_bounds(
    query: str, column: str, bound: tuple[int, int], is_last: bool
) -> str:
    """Wrap a user query in a derived table with a range predicate, the exact
    shape the reference generates (postgres.rs:488-510)."""
    return (
        f"select * from ({query}) as query_inner "
        f"where {bound_predicate(column, bound, is_last)}"
    )


def create_bounded_queries(
    query: str, partition_on: str, partition_num: int, mn: int, mx: int
) -> list[str]:
    """One range-bounded SQL string per partition (partition.rs:116-134)."""
    bs = bounds(mn, mx, partition_num)
    return [
        wrap_query_with_bounds(query, partition_on, b, i == len(bs) - 1)
        for i, b in enumerate(bs)
    ]
