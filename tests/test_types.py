"""Type bridge tests: geo text parsing against the reference's encodings
(SURVEY 1.3 / FIXTURES.md 2), time/uuid conversions, and an all-types
round-trip mirroring the pg_datatypes matrix."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from conecta_spark.types import (
    PG_TO_SPARK,
    REFERENCE_UNSUPPORTED,
    apply_pg_casts,
    parse_box,
    parse_circle,
    parse_line,
    parse_lseg,
    parse_path,
    parse_point,
    parse_polygon,
    time_to_micros,
    uuid_to_binary,
)


@pytest.fixture(scope="module")
def geo_df(spark):
    # Literal Postgres text output for each geometric type
    # (values mirror pg_datatypes_data.sql / FIXTURES.md 2).
    return spark.createDataFrame(
        [
            (
                "(1,2)",
                "<(0,0),5>",
                "{1,-1,0}",
                "(2,2),(0,0)",
                "[(0,0),(3,4)]",
                "((1,1),(4,1),(4,4),(1,4))",
                "((0,0),(4,0),(2,3))",
            )
        ],
        "point string, circle string, line string, box string, "
        "lseg string, path string, polygon string",
    )


class TestGeoParsers:
    def test_point(self, geo_df):
        assert geo_df.select(parse_point("point").alias("v")).first().v == [1.0, 2.0]

    def test_circle(self, geo_df):
        assert geo_df.select(parse_circle("circle").alias("v")).first().v == [0.0, 0.0, 5.0]

    def test_line(self, geo_df):
        assert geo_df.select(parse_line("line").alias("v")).first().v == [1.0, -1.0, 0.0]

    def test_box(self, geo_df):
        assert geo_df.select(parse_box("box").alias("v")).first().v == [2.0, 2.0, 0.0, 0.0]

    def test_lseg(self, geo_df):
        assert geo_df.select(parse_lseg("lseg").alias("v")).first().v == [0.0, 0.0, 3.0, 4.0]

    def test_path_open_flag(self, geo_df):
        v = geo_df.select(parse_path("lseg").alias("v")).first().v
        assert v[0] == 1.0 and v[1] == 2.0  # open, 2 points

    def test_path_closed(self, geo_df):
        v = geo_df.select(parse_path("path").alias("v")).first().v
        assert v == [0.0, 4.0, 1.0, 1.0, 4.0, 1.0, 4.0, 4.0, 1.0, 4.0]

    def test_polygon(self, geo_df):
        v = geo_df.select(parse_polygon("polygon").alias("v")).first().v
        assert v == [0.0, 0.0, 4.0, 0.0, 2.0, 3.0]

    def test_negative_and_scientific(self, spark):
        df = spark.createDataFrame([("(-1.5,2e3)",)], "p string")
        assert df.select(parse_point("p").alias("v")).first().v == [-1.5, 2000.0]

    def test_apply_pg_casts(self, geo_df):
        out = apply_pg_casts(
            geo_df, {"point": "point", "circle": "circle", "box": "box"}
        )
        row = out.first()
        assert row.point == [1.0, 2.0]
        assert row.circle == [0.0, 0.0, 5.0]
        assert dict(out.dtypes)["point"] == "array<double>"


class TestScalarConversions:
    def test_time_to_micros(self, spark):
        df = spark.createDataFrame(
            [("14:30:00",), ("00:00:00.000001",), ("23:59:59.999999",)],
            "t string",
        )
        vals = [r.v for r in df.select(time_to_micros("t").alias("v")).collect()]
        assert vals == [52_200_000_000, 1, 86_399_999_999]

    def test_uuid_to_binary(self, spark):
        df = spark.createDataFrame(
            [("123e4567-e89b-12d3-a456-426614174000",)], "u string"
        )
        b = bytes(df.select(uuid_to_binary("u").alias("v")).first().v)
        assert len(b) == 16
        assert b.hex() == "123e4567e89b12d3a456426614174000"


class TestTypeMatrix:
    """pg_datatypes-style round trip: every supported Spark type survives
    DataFrame -> Arrow -> values (reference type test,
    tests/databases/test_postgres.py:7-10)."""

    def test_all_types_roundtrip(self, spark):
        import pyspark.sql.types as T

        schema = T.StructType(
            [
                T.StructField("id", T.IntegerType()),
                T.StructField("small_int", T.ShortType()),
                T.StructField("big_int", T.LongType()),
                T.StructField("double_", T.DoubleType()),
                T.StructField("varchar_", T.StringType()),
                T.StructField("bool_", T.BooleanType()),
                T.StructField("bytea_", T.BinaryType()),
                T.StructField("date_", T.DateType()),
                T.StructField("timestamp_", T.TimestampNTZType()),
                T.StructField("int_array", T.ArrayType(T.IntegerType())),
                T.StructField("text_array", T.ArrayType(T.StringType())),
                T.StructField("bool_array", T.ArrayType(T.BooleanType())),
                T.StructField("double_array", T.ArrayType(T.DoubleType())),
            ]
        )
        row = (
            1,
            5,
            9_000_000_000,
            2.71828,
            "Hello, world!",
            True,
            bytes.fromhex("deadbeef"),
            datetime.date(2025, 8, 22),
            datetime.datetime(2025, 8, 22, 14, 30, 0),
            [1, 2, 3],
            ["foo", "bar", "baz"],
            [True, False],
            [3.14159, 2.71828],
        )
        df = spark.createDataFrame([row], schema)
        table = df.toArrow()
        assert table.num_rows == 1
        got = table.to_pylist()[0]
        assert got["big_int"] == 9_000_000_000
        assert bytes(got["bytea_"]) == bytes.fromhex("deadbeef")
        assert got["int_array"] == [1, 2, 3]
        assert got["timestamp_"] == datetime.datetime(2025, 8, 22, 14, 30)

    def test_mapping_tables_cover_reference_matrix(self):
        # every reference-supported pg type has a Spark mapping
        for pg in ["bool", "int2", "int4", "int8", "float4", "float8",
                   "text", "varchar", "bytea", "uuid", "date", "time",
                   "timestamp", "point", "polygon", "geometry", "_int4",
                   "_text", "_uuid"]:
            assert pg in PG_TO_SPARK
        # and the reference's panic set is supported, not panicking
        for pg in ["numeric", "timestamptz", "interval", "json", "jsonb"]:
            assert pg in REFERENCE_UNSUPPORTED


class TestBinaryGeoDecoders:
    """Postgres binary wire format -> array<double> (postgres.rs:29-290
    encodings; path/polygon headers per the documented wire format)."""

    @pytest.fixture(scope="class")
    def bin_df(self, spark):
        import struct

        point = struct.pack(">2d", 1.5, -2.0)
        circle = struct.pack(">3d", 0.0, 1.0, 5.0)
        box = struct.pack(">4d", 1.0, 2.0, 3.0, 4.0)
        path = b"\x01" + (2).to_bytes(4, "big") + struct.pack(">4d", 1.0, 2.0, 3.0, 4.0)
        poly = (3).to_bytes(4, "big") + struct.pack(">6d", 0.0, 0.0, 1.0, 0.0, 0.0, 1.0)
        return spark.createDataFrame(
            [(point, circle, box, path, poly)],
            "pt binary, ci binary, bx binary, pa binary, pg binary",
        )

    def test_fixed_width_forms(self, bin_df):
        from conecta_spark.types import decode_geo_binary

        row = bin_df.select(
            decode_geo_binary("pt", "point").alias("pt"),
            decode_geo_binary("ci", "circle").alias("ci"),
            decode_geo_binary("bx", "box").alias("bx"),
        ).collect()[0]
        assert row["pt"] == [1.5, -2.0]
        assert row["ci"] == [0.0, 1.0, 5.0]
        assert row["bx"] == [1.0, 2.0, 3.0, 4.0]

    def test_path_and_polygon_headers(self, bin_df):
        from conecta_spark.types import decode_geo_binary

        row = bin_df.select(
            decode_geo_binary("pa", "path").alias("pa"),
            decode_geo_binary("pg", "polygon").alias("pg"),
        ).collect()[0]
        # path: [is_open, n_points, coords...] -- same encoding as the
        # text parser
        assert row["pa"] == [1.0, 2.0, 1.0, 2.0, 3.0, 4.0]
        assert row["pg"] == [0.0, 0.0, 1.0, 0.0, 0.0, 1.0]

    def test_binary_and_text_forms_agree(self, spark):
        """The two decode paths must produce identical encodings."""
        import struct

        from conecta_spark.types import decode_geo_binary, parse_point

        df = spark.createDataFrame(
            [(struct.pack(">2d", 3.25, -4.5), "(3.25,-4.5)")],
            "b binary, t string",
        )
        row = df.select(
            decode_geo_binary("b", "point").alias("frombin"),
            parse_point("t").alias("fromtext"),
        ).collect()[0]
        assert row["frombin"] == row["fromtext"]

    def test_null_and_bad_type(self, spark):
        from conecta_spark.types import decode_geo_binary

        df = spark.createDataFrame([(None,)], "b binary")
        assert df.select(
            decode_geo_binary("b", "point").alias("v")
        ).collect()[0]["v"] is None
        with pytest.raises(ValueError):
            decode_geo_binary("b", "text")


class TestGeoDecoderProperties:
    """Property-based agreement between the binary and text decode paths
    (hypothesis; driver-side only -- no Spark jobs, so thousands of cases
    are cheap)."""

    def test_fixed_forms_roundtrip(self):
        import struct

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from conecta_spark.types import _GEO_FIXED_WIDTH, _decode_geo_bytes

        coords = st.floats(
            min_value=-1e12, max_value=1e12, allow_nan=False, width=64
        )

        @settings(max_examples=200, deadline=None)
        @given(data=st.data())
        def check(data):
            for pg_type, n in _GEO_FIXED_WIDTH.items():
                vals = [data.draw(coords) for _ in range(n)]
                raw = struct.pack(f">{n}d", *vals)
                assert _decode_geo_bytes(pg_type, raw) == vals

        check()

    def test_path_polygon_headers_roundtrip(self):
        import struct

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from conecta_spark.types import _decode_geo_bytes

        pts = st.lists(
            st.tuples(
                st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
                st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
            ),
            min_size=1,
            max_size=16,
        )

        @settings(max_examples=100, deadline=None)
        @given(points=pts, is_open=st.booleans())
        def check(points, is_open):
            flat = [c for p in points for c in p]
            body = struct.pack(f">{len(flat)}d", *flat)
            path = (
                (b"\x01" if is_open else b"\x00")
                + len(points).to_bytes(4, "big")
                + body
            )
            got = _decode_geo_bytes("path", path)
            assert got == [1.0 if is_open else 0.0, float(len(points)), *flat]
            poly = len(points).to_bytes(4, "big") + body
            assert _decode_geo_bytes("polygon", poly) == flat

        check()


class TestBridgeCoverage:
    def test_common_pg_types_pass_the_bridge(self, spark):
        """Types Spark's JDBC layer lands fine (ranges, arrays of
        varchar/date/timestamp/numeric, name/oid/inet/money/...) must not
        raise: the r6 bridge rejected them and hard-failed
        previously-working reads (r7 advice finding)."""
        from conecta_spark.types import apply_pg_casts

        df = spark.createDataFrame(
            [("x",)], "c string"
        )
        for pg in (
            "tsrange", "int4range", "int8range", "numrange", "tstzrange",
            "daterange", "_varchar", "_date", "_timestamp", "_numeric",
            "name", "oid", "inet", "cidr", "macaddr", "money", "xml",
        ):
            out = apply_pg_casts(df, {"c": pg})
            assert out.columns == ["c"], pg

    def test_docstring_range_claim_is_true(self):
        """The module docstring claims ranges are supported; keep the
        claim and the matrix in sync."""
        from conecta_spark.types import bridgeable_pg_types

        assert {"int4range", "int8range", "numrange", "tsrange",
                "tstzrange", "daterange"} <= bridgeable_pg_types()
