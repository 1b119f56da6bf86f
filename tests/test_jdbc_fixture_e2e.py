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

    def __init__(
        self,
        spark,
        rows_file: str = "rows.parquet",
        typeof_file: str = "typeof.parquet",
        sql: str = SQL,
    ):
        super().__init__(spark, url="jdbc:postgresql://recorded/db")
        rows = spark.read.parquet(os.path.join(FIXDIR, rows_file))
        cols = rows.columns
        typed = ", ".join(f'pg_typeof("{c}")::text as "{c}"' for c in cols)
        typeof_sql = (
            f"select {typed} from ({sql}) as typeof_inner limit 1"
        )
        self._exchange = {
            sql: rows,
            typeof_sql: spark.read.parquet(
                os.path.join(FIXDIR, typeof_file)
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


# -- r10: arrays through the bridge + the binary geo decode path -------------

ARR_SQL = "select * from typed_rows_arr"


def test_array_columns_bridge_end_to_end(spark):
    """pg arrays land list-typed from Spark's JDBC layer while pg_typeof
    reports 'integer[]' spellings: the alias layer must normalize them to
    the bridge's '_int4' catalog names, or every array column raises
    UnsupportedPgTypeError (the pre-r10 behavior this pins against)."""
    src = ReplayJDBC(
        spark, "rows_arr.parquet", "typeof_arr.parquet", ARR_SQL
    )
    types = src.pg_column_types(ARR_SQL)
    assert types == {
        "id": "int4",
        "tags": "_text",
        "scores": "_float8",
        "counts": "_int4",
        "bigs": "_int8",
        "flags": "_bool",
    }
    tbl = read_sql(src, ARR_SQL, return_backend="pyarrow")
    d = tbl.to_pydict()
    assert d["tags"] == [["a", "b"], [], None]
    assert d["scores"] == [[1.5, -2.25], [0.0], None]
    assert d["counts"] == [[1, 2, 3], [0], None]
    assert d["bigs"] == [[9007199254740993], [], None]
    assert d["flags"] == [[True, False], [True], None]


def test_binary_geo_decoders_equal_text_path_on_same_geometries(
    spark, replayed
):
    """Every O17 geo type end-to-end through the BINARY wire decoders
    (bytea-staged parquet, the COPY BINARY ingestion path): decoding the
    recorded wire bytes must land exactly the text-path result for the
    same geometries -- the two wire forms are one logical type."""
    from conecta_spark.types import decode_geo_binary

    _, text_tbl = replayed
    staged = spark.read.parquet(
        os.path.join(FIXDIR, "rows_geo_binary.parquet")
    )
    geo_types = {
        "pt": "point",
        "poly": "polygon",
        "circ": "circle",
        "bx": "box",
        "seg": "lseg",
        "ln": "line",
        "pth": "path",
    }
    decoded = staged.select(
        "id",
        *[
            decode_geo_binary(c, pg).alias(c)
            for c, pg in geo_types.items()
        ],
    )
    got = decoded.orderBy("id").toPandas()
    text = text_tbl.to_pydict()
    for c in geo_types:
        binary_vals = [
            None if v is None else [float(x) for x in v] for v in got[c]
        ]
        assert binary_vals == text[c], c
