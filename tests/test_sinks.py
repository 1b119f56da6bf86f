"""Write-side behavior: partitioned layout prunes, bucketed layout joins
without an exchange, round trips preserve data."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from conecta_spark.sources.sinks import (
    read_back,
    write_bucketed_table,
    write_parquet,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    from conecta_spark.sources.parquet import load_parquet

    return load_parquet(spark, f"{sf_dir}/orders.parquet").cache()


def test_roundtrip_preserves_rows(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "orders_plain")
    write_parquet(orders, path, target_files=4)
    back = read_back(spark, path)
    assert back.count() == orders.count()
    assert sorted(back.columns) == sorted(orders.columns)
    # target_files controls the physical layout
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4


def test_partitioned_write_prunes_directories(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "orders_by_priority")
    write_parquet(orders, path, partition_by=("o_orderpriority",))
    # hive layout on disk
    subdirs = [d for d in os.listdir(path) if d.startswith("o_orderpriority=")]
    assert len(subdirs) == 5
    back = read_back(spark, path)
    q = back.where(F.col("o_orderpriority") == "1-URGENT")
    # partition filter must prune at the source, not post-scan
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert q.count() == orders.where("o_orderpriority = '1-URGENT'").count()


def test_bucketed_join_skips_shuffle(spark, orders, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sink"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_table(
            orders.select("o_orderkey", "o_totalprice"),
            "orders_b1",
            bucket_by=("o_orderkey",),
            n_buckets=8,
            path=f"{base}/b1",
        )
        write_bucketed_table(
            orders.select("o_orderkey", "o_orderpriority"),
            "orders_b2",
            bucket_by=("o_orderkey",),
            n_buckets=8,
            path=f"{base}/b2",
        )
        j = spark.table("orders_b1").join(spark.table("orders_b2"), "o_orderkey")
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        # co-bucketed join: no Exchange on either side
        import re

        assert not re.findall(r"^\(\d+\) Exchange", plan, flags=re.M), plan
        assert j.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b1")
        spark.sql("DROP TABLE IF EXISTS orders_b2")


def test_target_mb_sizes_file_count_from_plan_stats(spark, orders, tmp_path_factory):
    from conecta_spark.sources.sinks import estimated_bytes

    assert estimated_bytes(orders) > 0
    # A relation Catalyst estimates at ~16 MB (2M longs): a 4 MB target
    # must split the write into ~4 files; a huge target must produce one.
    wide = spark.range(2_000_000)
    est = estimated_bytes(wide)
    assert est >> 20 >= 8
    path_many = str(tmp_path_factory.mktemp("sink") / "sized_many")
    write_parquet(wide, path_many, target_mb=4)
    path_one = str(tmp_path_factory.mktemp("sink") / "sized_one")
    write_parquet(wide, path_one, target_mb=(est >> 20) + 1024)
    n_many = len([f for f in os.listdir(path_many) if f.endswith(".parquet")])
    n_one = len([f for f in os.listdir(path_one) if f.endswith(".parquet")])
    assert n_one == 1
    assert n_many == -(-est // (4 << 20))


def test_cluster_by_narrows_row_group_ranges(spark, orders, tmp_path_factory):
    """sortWithinPartitions before write must produce parquet files whose
    row groups are internally sorted on the cluster column -- the property
    row-group min/max pruning depends on."""
    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("sink") / "clustered")
    write_parquet(orders, path, target_files=2, cluster_by=("o_orderdate",))
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert files
    for fname in files:
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = md.schema.to_arrow_schema().get_field_index("o_orderdate")
        ranges = [
            (
                md.row_group(g).column(idx).statistics.min,
                md.row_group(g).column(idx).statistics.max,
            )
            for g in range(md.num_row_groups)
        ]
        # Sorted within the file: successive row groups never overlap
        # backwards (each group's min >= the previous group's min).
        assert ranges == sorted(ranges)


def test_cluster_by_adds_no_exchange(spark, orders):
    """The clustering sort is partition-local: the write plan must not
    gain a shuffle from it."""
    out = orders.repartition(2).sortWithinPartitions("o_orderdate")
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    import re

    # exactly the one explicit repartition exchange, none from the sort
    assert len(re.findall(r"^\(\d+\) Exchange\b", p, flags=re.M)) == 1
    assert "Sort" in p


def test_upsert_parquet_replaces_by_key_and_carries_rest(
    spark, tmp_path_factory
):
    from pyspark.sql import Row

    from conecta_spark.sources.sinks import upsert_parquet

    path = str(tmp_path_factory.mktemp("upsert") / "tbl")
    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    upsert_parquet(spark, path, base, ("k",))          # initial load
    updates = spark.createDataFrame([Row(k=2, v="B2"), Row(k=4, v="d")])
    upsert_parquet(spark, path, updates, ("k",))
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
    # idempotent replay of the same updates changes nothing
    upsert_parquet(spark, path, updates, ("k",))
    again = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert again == got
    import os

    assert not os.path.exists(path + ".__staging__")
    assert not os.path.exists(path + ".__retired__")
