"""Partition planning (pure Python, Spark-free)."""
from .partition import PartitionConfig, QueryPartitioningMode, NeededMetadata, bounds, create_bounded_queries, wrap_query_with_bounds, bound_predicate
from .metadata import PartitionPlan, create_partition_plan
