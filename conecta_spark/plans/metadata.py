"""Partition-plan construction (reference: conecta-core/src/metadata.rs).

``create_partition_plan`` orchestrates config validation, the optional
MIN/MAX metadata probe, and bounded-query generation into a
:class:`PartitionPlan` -- the reference's whole "query planner"
(metadata.rs:27-101).  Unlike the reference we do not emit dead fields
(``metadata_query`` hardcoded to ``"fake"``, always-empty ``counts``;
metadata.rs:73-80 -- flagged as do-not-replicate in SURVEY 4.4).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .partition import (
    NeededMetadata,
    PartitionConfig,
    QueryPartitioningMode,
    create_bounded_queries,
)


@dataclass
class PartitionPlan:
    """The planner's output: the per-partition SQL plus probed metadata
    (metadata.rs:85-101)."""

    min: int | None
    max: int | None
    data_queries: list[str]
    config: PartitionConfig
    counts: list[int] = field(default_factory=list)

    @property
    def partition_count(self) -> int:
        return len(self.data_queries)

    def to_dict(self) -> dict:
        return {
            "min": self.min,
            "max": self.max,
            "counts": list(self.counts),
            "data_queries": list(self.data_queries),
            "config": self.config.to_dict(),
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict())


def create_partition_plan(source, config: PartitionConfig) -> PartitionPlan:
    """Build the partition plan, probing MIN/MAX from ``source`` only when
    the user did not supply ``partition_range`` (metadata.rs:27-83).

    ``source`` is any object with ``min_max(query, column) ->
    (int|None, int|None)`` -- see :mod:`conecta_spark.sources.base`.
    """
    mn: int | None = None
    mx: int | None = None

    if config.mode is QueryPartitioningMode.ONE_PARTITIONED_QUERY:
        if config.partition_range is not None:
            mn, mx = config.partition_range
        elif config.needed_metadata is NeededMetadata.COUNT_AND_MIN_MAX:
            mn, mx = source.min_max(config.query[0], config.partition_on)
            if mn is None or mx is None:
                raise ValueError(
                    f"partition column {config.partition_on!r} has no "
                    "non-null values; cannot partition an empty range"
                )
        if mn == mx:
            # Degenerate single-value range: one partition covers it.
            data_queries = [
                f"select * from ({config.query[0]}) as query_inner "
                f"where {config.partition_on} >= {mn} "
                f"and {config.partition_on} <= {mx}"
            ]
        else:
            data_queries = create_bounded_queries(
                config.query[0],
                config.partition_on,
                config.partition_num,
                mn,
                mx,
            )
    elif config.mode is QueryPartitioningMode.PARTITIONED_QUERIES:
        data_queries = list(config.query)
    else:
        data_queries = [config.query[0]]

    return PartitionPlan(min=mn, max=mx, data_queries=data_queries, config=config)
