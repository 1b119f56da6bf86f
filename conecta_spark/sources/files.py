"""Multi-format directory sources: csv / json (lines) / orc catalogs with
the same contract as the parquet catalog (one file or directory per table,
view named after the stem, SQL answered over the views).

The reference supports exactly one file-free source (Postgres); these are
engine extensions riding Spark's built-in readers.  Format notes:

* csv: ``header`` + ``inferSchema`` on by default -- schema inference costs
  an extra pass; at scale pass an explicit ``schema`` option instead.
* json: JSON-lines; Spark infers by sampling.
* orc: columnar like parquet, predicate pushdown works the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .parquet import ParquetDirSource

_FORMATS = {"csv", "json", "orc"}

_DEFAULT_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "inferSchema": "true"},
    "json": {},
    "orc": {},
}


class FilesDirSource(ParquetDirSource):
    """A directory of ``<table>.<fmt>`` files (or per-table subdirectories)
    as a queryable catalog."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fmt: str,
        options: dict[str, str] | None = None,
    ):
        if fmt not in _FORMATS:
            raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
        self.fmt = fmt
        self.options = {**_DEFAULT_OPTIONS[fmt], **(options or {})}
        self.EXT = f".{fmt}"
        super().__init__(spark, root)

    def _load(self, path: str) -> DataFrame:
        return self.spark.read.format(self.fmt).options(**self.options).load(path)
