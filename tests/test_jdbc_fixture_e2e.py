"""Recorded-fixture JDBC end-to-end: the closest this container gets to the
reference's testcontainers Postgres suite
(/root/reference/conecta-python/conecta/tests/conftest.py:23-91).

``tests/fixtures/pg_wire/`` holds one recorded wire exchange as parquet:

* ``rows.parquet`` -- what pgJDBC hands Spark for a ``select * from
  typed_rows``: native JVM values for int/text/numeric, *untyped text* for
  every type pgJDBC has no JDBC mapping for (all 7 geo forms, uuid, time,
  jsonb) -- the same surface the reference decodes from the binary wire
  (postgres.rs:595-646);
* ``typeof.parquet`` -- the one-row ``pg_typeof(...)::text`` probe result,
  with the SQL-standard spellings ("time without time zone") the alias
  table must normalize.

``ReplayJDBC`` serves those frames for exactly the statements the engine is
expected to issue -- an unexpected statement fails the test, so the
exchange script itself is pinned.  The read drives the full public path:
``read_sql(source, sql, return_backend="pyarrow")`` -> schema probe ->
pg_typeof probe -> type bridge -> Arrow export, and the result is compared
value-by-value against the golden decoded table.
"""

from __future__ import annotations

import os
from decimal import Decimal

import pytest

from conecta_spark.io import read_sql
from conecta_spark.sources.jdbc import JDBCSource

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "pg_wire")
SQL = "select * from typed_rows"


class ReplayJDBC(JDBCSource):
    """JDBCSource replaying a recorded wire exchange: every ``_raw_query``
    must match a recorded statement (no fallback -- the statement script is
    part of the contract)."""

    def __init__(self, spark):
        super().__init__(spark, url="jdbc:postgresql://recorded/db")
        rows = spark.read.parquet(os.path.join(FIXDIR, "rows.parquet"))
        cols = rows.columns
        typed = ", ".join(f'pg_typeof("{c}")::text as "{c}"' for c in cols)
        typeof_sql = (
            f"select {typed} from ({SQL}) as typeof_inner limit 1"
        )
        self._exchange = {
            SQL: rows,
            typeof_sql: spark.read.parquet(
                os.path.join(FIXDIR, "typeof.parquet")
            ),
        }
        self.statements: list[str] = []

    def _raw_query(self, sql):
        self.statements.append(sql)
        assert sql in self._exchange, f"unexpected statement: {sql}"
        return self._exchange[sql]


@pytest.fixture()
def replayed(spark):
    src = ReplayJDBC(spark)
    table = read_sql(src, SQL, return_backend="pyarrow")
    return src, table


def test_exchange_script_is_exactly_the_recorded_statements(replayed):
    src, _ = replayed
    # user query (data), schema probe (columns), pg_typeof probe: three
    # statements, two distinct -- and nothing else on the wire.
    assert [s.startswith("select pg_typeof") for s in src.statements].count(
        True
    ) == 1
    assert set(src.statements) == set(src._exchange)


def test_geo_columns_decode_to_flattened_doubles(replayed):
    _, tbl = replayed
    d = tbl.to_pydict()
    assert d["pt"] == [[1.5, 2.5], [-3.0, 400.0], None]
    assert d["poly"] == [[0, 0, 1, 0, 1, 1], [2, 2, 3, 3], None]
    assert d["circ"] == [[0, 0, 5], [1.5, -1.5, 0.5], None]
    assert d["bx"] == [[1, 1, 0, 0], [5, 6, 2, 3], None]
    assert d["seg"] == [[0, 0, 1, 1], [2, 0, 0, 2], None]
    assert d["ln"] == [[1, -1, 0], [0.5, 2, -3.25], None]
    # path: [is_open, n_points, coords...] (reference encoding)
    assert d["pth"] == [[1, 3, 0, 0, 1, 1, 2, 0], [0, 2, 0, 0, 0, 3], None]


def test_time_decodes_to_micros_since_midnight(replayed):
    _, tbl = replayed
    assert tbl.to_pydict()["t"] == [45_001_500_000, 0, None]


def test_passthrough_types_survive_untouched(replayed):
    _, tbl = replayed
    d = tbl.to_pydict()
    assert d["id"] == [1, 2, 3]
    assert d["name"] == ["alpha", "beta", None]
    assert d["uid"][0] == "123e4567-e89b-12d3-a456-426614174000"
    assert d["amount"][0] == Decimal("12345.678901000000000000")
    assert d["amount"][2] is None
    assert d["meta"] == ['{"k": 1}', "[1,2,3]", None]


def test_typeof_alias_normalization_applies_on_the_recorded_probe(spark):
    """'time without time zone' in the recorded probe must reach the bridge
    as 'time' (alias table), or the column would silently stay a string."""
    src = ReplayJDBC(spark)
    types = src.pg_column_types(SQL)
    assert types["t"] == "time"
    assert types["id"] == "int4"
    assert types["pt"] == "point"
