"""Parquet-directory source: a folder of ``<table>.parquet`` files becomes a
queryable catalog.

This is the engine's primary local/test backend (driver testdata layout,
TESTDATA.md).  At cluster scale the same code path serves any
directory-of-datasets layout readable by ``spark.read.parquet``.

Scale notes:

* Views are plain ``spark.read.parquet`` relations -- Catalyst pushes
  filters/projections into the scan (``PushedFilters``/``ReadSchema``), so a
  partition-bounded read touches only matching row groups.
* Partitioned reads are executed as ONE scan with a range filter, not N
  unioned scans: ``union(filter(a<=c<b) for each bound)`` would re-read the
  files N times, which at 100 TB is the difference between one pass and N
  passes.  The bounded per-partition SQL is still generated and exposed on
  the plan for introspection parity (reference behavior, postgres.rs:488-510).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.partition import QueryPartitioningMode
from .base import Source

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with nanosecond-timestamp handling.

    Spark rejects parquet TIMESTAMP(NANOS) outright ([PARQUET_TYPE_ILLEGAL]);
    the driver's ``events`` table uses it.  We read nanos as raw longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
    TimestampType -- the same precision the reference uses everywhere
    (postgres.rs:401-412 truncates to micros).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    ns_cols = _nanos_timestamp_columns(path)
    for name in ns_cols:
        if name in df.columns:
            df = df.withColumn(
                name,
                F.expr(f"timestamp_micros(CAST(`{name}` DIV 1000 AS LONG))"),
            )
    return df


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), from the footer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        inner = [n for n in sorted(os.listdir(path)) if n.endswith(".parquet")]
        if not inner:
            return []
        target = os.path.join(path, inner[0])
    try:
        schema = pq.read_schema(target)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


class ParquetDirSource(Source):
    """Register every ``*.parquet`` under ``root`` as a temp view named after
    the file stem, then answer SQL over those views.

    ``EXT``/``_load`` are the format hooks; :class:`conecta_spark.sources
    .files.FilesDirSource` reuses everything else for csv/json/orc."""

    EXT = ".parquet"

    def __init__(self, spark: SparkSession, root: str):
        super().__init__(spark)
        self.root = root.removeprefix("file://")
        if not os.path.isdir(self.root):
            raise ValueError(f"not a directory of {self.EXT} tables: {root!r}")
        self.tables: dict[str, str] = {}
        for name in sorted(os.listdir(self.root)):
            if name.endswith(self.EXT):
                stem = name[: -len(self.EXT)]
                if _IDENT.match(stem):
                    self.tables[stem] = os.path.join(self.root, name)
        if not self.tables:
            raise ValueError(f"no *{self.EXT} tables found under {root!r}")

    def _load(self, path: str) -> DataFrame:
        return load_parquet(self.spark, path)

    #: Temp views are SESSION-GLOBAL by name: two sources over different
    #: directories both register a view called ``lineitem``, and whichever
    #: registered last wins for every source.  Track the owning (root,
    #: format) per session so a pooled/cached source re-registers its own
    #: views when another catalog has clobbered them (cheap:
    #: re-registration only happens on an actual catalog switch).
    _VIEW_OWNER: dict[int, tuple[str, str]] = {}

    def register_views(self) -> None:
        key = id(self.spark)
        mine = (self.root, self.EXT)
        if ParquetDirSource._VIEW_OWNER.get(key) == mine:
            return
        for stem, path in self.tables.items():
            self._load(path).createOrReplaceTempView(stem)
        ParquetDirSource._VIEW_OWNER[key] = mine

    def query(self, sql: str) -> DataFrame:
        self.register_views()
        return self.spark.sql(sql)

    def _load_v2(self, path: str) -> DataFrame:
        """Read ``path`` through the DSv2 parquet source.

        V1 (the default) ignores ``spark.sql.parquet.aggregatePushdown``;
        only a V2 ``BatchScan`` can answer MIN/MAX/COUNT from row-group
        footers.  The source list is flipped just for relation resolution
        (the DataFrame keeps its V2 relation afterwards), so every other
        read in the session stays on the default path."""
        conf = self.spark.conf
        prev = conf.get("spark.sql.sources.useV1SourceList")
        conf.set("spark.sql.sources.useV1SourceList", "")
        try:
            return self.spark.read.parquet(path)
        finally:
            conf.set("spark.sql.sources.useV1SourceList", prev)

    def min_max_df(self, table: str, column: str) -> DataFrame:
        """MIN/MAX metadata probe as a footer-only scan (reference O8:
        ``postgres.rs:556-592`` reads the DB's index metadata; the parquet
        twin is ``PushedAggregation`` over row-group statistics -- the plan
        never touches data pages)."""
        df = self._load_v2(self.tables[table])
        return df.agg(
            F.min(column).cast("long").alias("mn"),
            F.max(column).cast("long").alias("mx"),
        )

    _FULL_SCAN = re.compile(
        r"select\s+\*\s+from\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", re.I
    )

    def min_max(self, sql: str, column: str) -> tuple[int | None, int | None]:
        m = self._FULL_SCAN.match(sql.strip())
        if (
            self.EXT == ".parquet"  # csv/json/orc subclasses have no footers
            and m
            and m.group(1).lower() in self.tables
            and column not in _nanos_timestamp_columns(self.tables[m.group(1).lower()])
        ):
            row = self.min_max_df(m.group(1).lower(), column).collect()[0]
        else:
            row = (
                self.query(sql)
                .agg(
                    F.min(column).cast("long").alias("mn"),
                    F.max(column).cast("long").alias("mx"),
                )
                .collect()[0]
            )
        return row["mn"], row["mx"]

    def read_partitioned(self, plan) -> DataFrame:
        cfg = plan.config
        if cfg.mode is QueryPartitioningMode.PARTITIONED_QUERIES:
            dfs = [self.query(q) for q in cfg.query]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionAll(d)
            return out
        base = self.query(cfg.query[0])
        if cfg.mode is QueryPartitioningMode.ONE_UNPARTITIONED_QUERY:
            return base
        # ONE_PARTITIONED_QUERY: single scan + range filter (see module
        # docstring).  Union of the plan's [start,stop) bounds == the closed
        # envelope [min, max]; NULL partition keys are dropped, matching the
        # reference (SURVEY 1.4).
        col = F.col(cfg.partition_on)
        return base.where(col.isNotNull() & (col >= plan.min) & (col <= plan.max))
