"""Write-side API: partitioned / bucketed parquet sinks and Arrow export.

The reference is read-only (its only "sink" is the zero-copy Arrow hand-off,
conecta-python/src/lib.rs:76-101 -- ours is io.export).  A real pipeline
needs durable outputs, so the engine adds the two layouts that matter at
100 TB:

* **Hive-partitioned parquet** (``partition_by``): directory pruning turns
  predicate-on-partition-column queries into partial scans.  Rule of thumb:
  partition on low-cardinality columns only (date, lang, source); a
  high-cardinality partition column creates millions of tiny files.
* **Bucketed tables** (``bucket_by``): pre-shuffles rows into a fixed
  number of hash buckets at write time, so later joins/aggregations on the
  bucket key skip their shuffle entirely (bucketed sort-merge join).  Spark
  requires ``saveAsTable`` for bucket metadata to survive.

``repartition`` before write controls output file count -- the single most
common cause of small-file pathology in long-lived datasets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple | list = (),
    mode: str = "overwrite",
    target_files: int | None = None,
    compression: str = "snappy",
) -> None:
    """Write ``df`` as (optionally hive-partitioned) parquet."""
    out = df
    if target_files:
        cols = list(partition_by)
        out = df.repartition(target_files, *cols) if cols else df.repartition(target_files)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: tuple | list,
    n_buckets: int,
    sort_by: tuple | list = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    Joins between two tables bucketed the same way on the join key run
    shuffle-free; aggregations on the bucket key skip the exchange."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *bucket_by
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_back(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
