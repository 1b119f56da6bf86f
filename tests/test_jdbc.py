"""JDBC source contract tests (no live database in this container).

Two promises the reference integration-tests against a real Postgres
(conecta-python tests with testcontainers) are pinned here with the network
layer stubbed out:

* the type bridge runs unconditionally on every user read -- geo text forms
  normalize to array<double> and TIME to us-since-midnight (the reference's
  always-on bridge, postgres.rs:595-646);
* ``read_partitioned`` hands Spark the exact bounded-predicate set the
  reference generates (postgres.rs:488-510): half-open interior ranges, a
  closed last range absorbing the remainder.
"""

from __future__ import annotations

import pytest

from conecta_spark.plans.metadata import create_partition_plan
from conecta_spark.plans.partition import PartitionConfig
from conecta_spark.sources.jdbc import JDBCSource


class StubJDBC(JDBCSource):
    """JDBCSource with the JDBC reads replaced by local fixtures."""

    def __init__(self, spark, frames, types_map=None, minmax=(0, 1499)):
        super().__init__(spark, url="jdbc:postgresql://stub/db")
        self._frames = frames  # sql -> DataFrame ("*" = fallback)
        self._types = types_map
        self._minmax = minmax
        self.captured: tuple[str, list[str]] | None = None

    def _raw_query(self, sql):
        return self._frames.get(sql, self._frames.get("*"))

    def pg_column_types(self, sql):
        if self._types is not None:
            return self._types
        return super().pg_column_types(sql)

    def min_max(self, sql, column):
        return self._minmax

    def _jdbc_predicates(self, sql, preds):
        self.captured = (sql, preds)
        return self._frames.get("*")


@pytest.fixture()
def geo_frame(spark):
    return spark.createDataFrame(
        [("(1,2)", "12:30:01.5", "a")], "pt string, t string, name string"
    )


def test_type_bridge_applies_on_query(spark, geo_frame):
    """A user read normalizes geo/time columns without any explicit call."""
    src = StubJDBC(
        spark,
        {"*": geo_frame},
        types_map={"pt": "point", "t": "time", "name": "text"},
    )
    row = src.query("select * from geo").collect()[0]
    assert row["pt"] == [1.0, 2.0]
    assert row["t"] == 45_001_500_000  # (12h30m)*1e6 + 1.5s in us
    assert row["name"] == "a"


def test_type_bridge_can_be_disabled(spark, geo_frame):
    src = StubJDBC(
        spark,
        {"*": geo_frame},
        types_map={"pt": "point", "t": "time", "name": "text"},
    )
    src.type_bridge = False
    row = src.query("select * from geo").collect()[0]
    assert row["pt"] == "(1,2)"


def test_type_bridge_survives_probe_failure(spark, geo_frame):
    """A backend without pg_typeof returns the raw frame, not an error."""

    class Failing(StubJDBC):
        def pg_column_types(self, sql):
            raise RuntimeError("no pg_typeof on this backend")

    src = Failing(spark, {"*": geo_frame})
    assert src.query("select * from geo").collect()[0]["pt"] == "(1,2)"


def test_pg_typeof_probe_normalizes_aliases(spark):
    """pg_typeof spells 'time without time zone'; the bridge keys on the
    internal typname 'time' -- the probe must translate."""
    base = spark.createDataFrame([("12:00:00", 1)], "t string, k int")
    typeof_sql = (
        'select pg_typeof("t")::text as "t", pg_typeof("k")::text as "k" '
        "from (select * from tbl) as typeof_inner limit 1"
    )
    typed = spark.createDataFrame(
        [("time without time zone", "integer")], "t string, k string"
    )
    src = StubJDBC(
        spark,
        {"select * from tbl": base, typeof_sql: typed, "*": base},
        types_map=None,
    )
    assert src.pg_column_types("select * from tbl") == {
        "t": "time",
        "k": "int4",
    }


def test_read_partitioned_reference_predicate_set(spark, geo_frame):
    """The predicates handed to Spark's JDBC reader must be exactly the
    reference's bounded set: [start, stop) interior, [start, max] last."""
    src = StubJDBC(spark, {"*": geo_frame}, types_map={})
    cfg = PartitionConfig(
        query=["select * from lineitem"],
        partition_on="l_orderkey",
        partition_num=4,
    )
    plan = create_partition_plan(src, cfg)
    src.read_partitioned(plan)
    sql, preds = src.captured
    assert sql == "select * from lineitem"
    assert preds == [
        "l_orderkey >= 0 and l_orderkey < 374",
        "l_orderkey >= 374 and l_orderkey < 749",
        "l_orderkey >= 749 and l_orderkey < 1124",
        "l_orderkey >= 1124 and l_orderkey <= 1499",
    ]
    # and the introspection plan carries the same bounds in its SQL
    for q, p in zip(plan.data_queries, preds):
        assert p in q


def test_unbridgeable_pg_type_raises_listing_every_column(spark, geo_frame):
    """SURVEY 1.3 contract: where the reference panics with a bare type
    OID (postgres.rs:642), the bridge raises a clean error naming EVERY
    column it cannot bridge and what to do about it."""
    from conecta_spark.types import UnsupportedPgTypeError

    # offenders are GENUINELY unknown types (custom enum/composite);
    # ranges moved into the bridge in r7 (they land as lossless pg text,
    # exactly what pgjdbc hands Spark's dialect) -- rejecting them broke
    # previously-working reads.
    src = StubJDBC(
        spark,
        {"*": geo_frame},
        types_map={"pt": "mood_enum", "t": "inventory_composite", "name": "text"},
    )
    with pytest.raises(UnsupportedPgTypeError) as ei:
        src.query("select * from tbl")
    assert ei.value.offenders == {"pt": "mood_enum", "t": "inventory_composite"}
    msg = str(ei.value)
    assert "pt (mood_enum)" in msg and "t (inventory_composite)" in msg
    assert "type_bridge=False" in msg  # the actionable escape hatch

    # and the escape hatch really is one: raw representation comes back
    src.type_bridge = False
    assert src.query("select * from tbl").collect() == geo_frame.collect()


def test_reference_unsupported_types_bridge_cleanly(spark, geo_frame):
    """NUMERIC/TIMESTAMPTZ/JSON etc. panic in the reference but are
    native here -- the bridge must accept them, not list them."""
    src = StubJDBC(
        spark,
        {"*": geo_frame},
        types_map={"pt": "numeric", "t": "timestamptz", "name": "jsonb"},
    )
    assert src.query("select * from tbl").count() == 1
