"""Multi-format catalog sources: csv/json dirs behave like the parquet
catalog — view registration, SQL, partitioned read_sql — end to end."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conecta_spark.io import read_sql
from conecta_spark.uri import parse_uri


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    from conecta_spark.sources.parquet import load_parquet

    return load_parquet(spark, f"{sf_dir}/orders.parquet").cache()


@pytest.fixture(scope="module")
def csv_root(orders, tmp_path_factory):
    root = tmp_path_factory.mktemp("csvcat")
    orders.coalesce(1).write.option("header", "true").csv(str(root / "orders.csv"))
    return str(root)


@pytest.fixture(scope="module")
def json_root(orders, tmp_path_factory):
    root = tmp_path_factory.mktemp("jsoncat")
    orders.coalesce(1).write.json(str(root / "orders.json"))
    return str(root)


def test_uri_dispatch_file_schemes():
    assert parse_uri("csv:///data/x").kind == "csv"
    assert parse_uri("json:///data/x").kind == "json"
    assert parse_uri("orc:///data/x").kind == "orc"
    assert parse_uri("parquet:///data/x") == parse_uri("parquet:///data/x")


def test_csv_catalog_counts(spark, orders, csv_root):
    df = read_sql(f"csv://{csv_root}", "select * from orders", spark=spark)
    assert df.count() == orders.count()


def test_csv_partitioned_read(spark, orders, csv_root):
    df = read_sql(
        f"csv://{csv_root}",
        "select * from orders",
        partition_on="o_orderkey",
        partition_num=4,
        spark=spark,
    )
    assert df.count() == orders.count()


def test_json_catalog_aggregate(spark, orders, json_root):
    df = read_sql(
        f"json://{json_root}",
        "select o_orderpriority, count(*) as c from orders group by 1",
        spark=spark,
    )
    got = {r.o_orderpriority: r.c for r in df.collect()}
    want = {
        r.o_orderpriority: r.c
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == want
