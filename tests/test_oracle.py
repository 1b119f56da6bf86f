"""Every registered query with an oracle must hash-match DuckDB at sf0.01 --
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from conecta_spark.queries import REGISTRY, _load_extensions

_load_extensions()

from .oracle_utils import assert_match, duckdb_con


@pytest.fixture(scope="module")
def con(oracle_dir):
    c = duckdb_con(oracle_dir)
    yield c
    c.close()


@pytest.mark.parametrize(
    "name", [n for n, q in REGISTRY.items() if q.oracle is not None]
)
def test_oracle_match(name, spark, oracle_dir, con):
    qd = REGISTRY[name]
    df = qd.fn(spark, oracle_dir)
    assert_match(name, df, con, qd.oracle)


@pytest.mark.parametrize(
    "name", [n for n, q in REGISTRY.items() if q.oracle is None]
)
def test_no_oracle_still_runs(name, spark, oracle_dir):
    df = REGISTRY[name].fn(spark, oracle_dir)
    assert df.count() >= 0
