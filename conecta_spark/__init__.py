"""conecta_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of surister/conecta, rebuilt Spark-first.

Public surface:

* :func:`read_sql` / :func:`create_partition_plan` -- partitioned parallel
  SQL loading with Arrow export (reference entry points, SURVEY 3.1-3.2).
* :func:`sql_bind` -- bind-parameter substitution (reference O23).
* :func:`get_session` -- Arrow-tuned SparkSession factory.
* :mod:`conecta_spark.operators` -- dedup / similarity-search extension ops.
* :mod:`conecta_spark.functions` -- text-analysis & vector column functions.
* :mod:`conecta_spark.streaming` -- Structured Streaming surface.
* :mod:`conecta_spark.multimodal` -- binary-payload (image/audio/video)
  column conventions and mapInPandas plumbing.
"""

from .bind import sql_bind
from .io import create_partition_plan, export, get_source, read_sql
from .plans.metadata import PartitionPlan
from .plans.partition import (
    NeededMetadata,
    PartitionConfig,
    QueryPartitioningMode,
    bounds,
)
from .session import get_session, tune_session
from .uri import parse_uri

__version__ = "0.1.0"

__all__ = [
    "read_sql",
    "create_partition_plan",
    "export",
    "get_source",
    "sql_bind",
    "get_session",
    "tune_session",
    "parse_uri",
    "PartitionConfig",
    "PartitionPlan",
    "QueryPartitioningMode",
    "NeededMetadata",
    "bounds",
    "__version__",
]
