"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q1-shaped grouped
aggregation) over /root/testdata/sf0.001.  ``queries()`` /``oracle_sql()``
expose the full registry from :mod:`conecta_spark.queries` -- one entry per
implemented operator from SURVEY.md section 2, each aliased identically in
Spark and oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from conecta_spark.queries import REGISTRY

    return REGISTRY["q12_groupby_agg"].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from conecta_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from conecta_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
