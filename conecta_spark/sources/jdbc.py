"""JDBC source: partition-parallel database loading, the reference's core
capability re-expressed on Spark's JDBC data source.

Reference parity map (citations into /root/reference):

* thread-per-partition rayon scan (postgres.rs:341-485)  -> one Spark task
  per element of ``predicates`` (or per stride partition).
* cursor streaming (postgres.rs:369-371)                 -> ``fetchsize``.
* connection pool sized to partitions (lib.rs:78-86)     -> ``numPartitions``.
* schema probe via ``limit 0`` prepare (postgres.rs:567-583) -> Spark's own
  ``WHERE 1=0`` resolution on the dbtable subquery.
* MIN/MAX pushdown (postgres.rs:556-592)                 -> one-row JDBC read
  of the same aggregate SQL.

Boundary semantics follow the reference, not stock Spark JDBC: Spark's
``partitionColumn`` options clamp the first/last strides open-ended and route
NULLs to the first partition, while conecta's generated predicates drop
out-of-range rows and NULL keys (SURVEY 1.4).  We therefore always pass
explicit ``predicates`` built by our planner instead of
``lowerBound``/``upperBound``.

Untested in this container (no database available); exercised only via its
pure-SQL helpers in unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.partition import QueryPartitioningMode, bound_predicate, bounds
from .base import Source


def min_max_sql(query: str, column: str) -> str:
    """The exact aggregate shape the reference pushes down
    (postgres.rs:585-592)."""
    return (
        f"select min({column})::bigint, max({column})::bigint "
        f"from ({query}) as query_inner"
    )


def merge_count_sql(queries: list[str]) -> str:
    """Single-statement summed COUNT over N user queries
    (postgres.rs:512-526)."""
    parts = " + ".join(
        f"(select count(*) from ({q}) as t{i})" for i, q in enumerate(queries)
    )
    return f"select {parts} as total_count"


class JDBCSource(Source):
    def __init__(
        self,
        spark: SparkSession,
        url: str,
        user: str | None = None,
        password: str | None = None,
        fetchsize: int = 10_000,
        driver: str = "org.postgresql.Driver",
    ):
        super().__init__(spark)
        self.url = url
        self.fetchsize = fetchsize
        self.properties: dict[str, str] = {"driver": driver}
        if user:
            self.properties["user"] = user
        if password:
            self.properties["password"] = password

    def _reader(self, dbtable: str):
        r = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", dbtable)
            .option("fetchsize", str(self.fetchsize))
        )
        for k, v in self.properties.items():
            r = r.option(k, v)
        return r

    def query(self, sql: str) -> DataFrame:
        return self._reader(f"({sql}) as query_inner").load()

    def min_max(self, sql: str, column: str) -> tuple[int | None, int | None]:
        row = self.query(min_max_sql(sql, column)).collect()[0]
        return row[0], row[1]

    def read_partitioned(self, plan) -> DataFrame:
        cfg = plan.config
        if cfg.mode is QueryPartitioningMode.PARTITIONED_QUERIES:
            out = None
            for q in cfg.query:
                df = self.query(q)
                out = df if out is None else out.unionAll(df)
            return out
        if cfg.mode is QueryPartitioningMode.ONE_UNPARTITIONED_QUERY:
            return self.query(cfg.query[0])
        # One task per range predicate; the database sees N concurrent
        # bounded cursors, exactly the reference's execution shape.
        preds = [
            bound_predicate(cfg.partition_on, b, i == cfg.partition_num - 1)
            for i, b in enumerate(bounds(plan.min, plan.max, cfg.partition_num))
        ]
        return self._jdbc_predicates(cfg.query[0], preds)

    def _jdbc_predicates(self, sql: str, preds: list[str]) -> DataFrame:
        props = dict(self.properties)
        props["fetchsize"] = str(self.fetchsize)
        return self.spark.read.jdbc(
            url=self.url,
            table=f"({sql}) as query_inner",
            predicates=preds,
            properties=props,
        )
