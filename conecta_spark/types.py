"""Type system bridge: Postgres -> Spark mappings and the post-read cast
layer (reference O13/O17/O18; conecta-core/src/schema.rs,
postgres.rs:595-646; documented table conecta-docs
docs/reference/databases/postgres.md:30-157).

The reference maps Postgres wire types to Arrow; on Spark the JDBC dialect
already covers primitives/temporal/arrays, so this module adds what Spark's
PostgresDialect gets wrong or loses:

* UUID -> Spark reads as string; the reference used FixedSizeBinary(16).
  We keep string (lossless hex form) and provide ``uuid_to_binary``.
* TIME -> microseconds-since-midnight BIGINT (reference Arrow Time64(us),
  postgres.rs:401-405; Spark has no TimeType before 4.x's TIME).
* Geometric types -> Postgres *text* representations parsed into
  ``array<double>`` with the reference's encodings (SURVEY 1.3): Point
  (x,y)->[x,y]; Circle <(x,y),r> -> [x,y,r]; Box/Lseg -> [x1,y1,x2,y2];
  Path -> [is_open, n, x1, y1, ...]; Polygon -> [x1, y1, ...]; Line
  {a,b,c} -> [a,b,c].  Parsing is JVM-side regexp -- no UDFs.  The binary
  *wire* forms (what the reference decodes, postgres.rs:29-290) are covered
  too via :func:`decode_geo_binary` for byte-staged columns.
* Unsupported-in-reference types (NUMERIC, TIMESTAMPTZ, INTERVAL, JSON --
  which PANIC there, postgres.rs:642) are all native in Spark:
  DecimalType, TimestampType, DayTimeIntervalType, string+from_json.
  Range types (also a reference panic) land in their lossless Postgres
  text form as strings.  We support them instead of panicking;
  ``REFERENCE_UNSUPPORTED`` documents the divergence.
* Genuinely unknown types (custom enums, composites, extensions) raise
  :class:`UnsupportedPgTypeError` naming every offending column -- the
  clean-error half of the contract; ``type_bridge=False`` is the
  all-or-nothing escape hatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Postgres type name -> Spark type, mirroring the reference's supported
#: matrix (schema.rs:70-141) with Spark-native choices.
PG_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "int2": T.ShortType(),
    "int4": T.IntegerType(),
    "int8": T.LongType(),
    "float4": T.FloatType(),
    "float8": T.DoubleType(),
    "char": T.StringType(),
    "bpchar": T.StringType(),
    "text": T.StringType(),
    "varchar": T.StringType(),
    "bytea": T.BinaryType(),
    "uuid": T.StringType(),
    "date": T.DateType(),
    "time": T.LongType(),  # us since midnight
    "timestamp": T.TimestampNTZType(),
    # arrays
    "_int2": T.ArrayType(T.ShortType()),
    "_int4": T.ArrayType(T.IntegerType()),
    "_int8": T.ArrayType(T.LongType()),
    "_float4": T.ArrayType(T.FloatType()),
    "_float8": T.ArrayType(T.DoubleType()),
    "_text": T.ArrayType(T.StringType()),
    "_bool": T.ArrayType(T.BooleanType()),
    "_bytea": T.ArrayType(T.BinaryType()),
    "_uuid": T.ArrayType(T.StringType()),
    "_varchar": T.ArrayType(T.StringType()),
    "_bpchar": T.ArrayType(T.StringType()),
    "_char": T.ArrayType(T.StringType()),
    "_date": T.ArrayType(T.DateType()),
    "_timestamp": T.ArrayType(T.TimestampNTZType()),
    "_numeric": T.ArrayType(T.DecimalType(38, 18)),
    # system/identifier and network types Spark's JDBC layer lands as-is
    # (pgjdbc surfaces them via getString/getLong; the r6 bridge rejected
    # them and broke previously-working reads -- the r7 advice finding)
    "name": T.StringType(),
    "oid": T.LongType(),
    "xml": T.StringType(),
    "inet": T.StringType(),
    "cidr": T.StringType(),
    "macaddr": T.StringType(),
    "macaddr8": T.StringType(),
    "money": T.StringType(),
    "varbit": T.StringType(),
    # geo -> flattened coords
    "point": T.ArrayType(T.DoubleType()),
    "line": T.ArrayType(T.DoubleType()),
    "circle": T.ArrayType(T.DoubleType()),
    "box": T.ArrayType(T.DoubleType()),
    "lseg": T.ArrayType(T.DoubleType()),
    "path": T.ArrayType(T.DoubleType()),
    "polygon": T.ArrayType(T.DoubleType()),
    # PostGIS passthrough (EWKB bytes)
    "geometry": T.BinaryType(),
}

#: Types the reference panics on (postgres.rs:642) but we support natively.
#: Ranges land in their Postgres text form (``[lo,hi)``) -- lossless, and
#: what pgjdbc hands Spark's dialect anyway; parse with substring/split or
#: cast bounds in SQL when the endpoints are needed typed.
REFERENCE_UNSUPPORTED: dict[str, T.DataType] = {
    "numeric": T.DecimalType(38, 18),
    "timestamptz": T.TimestampType(),
    "timetz": T.StringType(),
    "interval": T.DayTimeIntervalType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "int4range": T.StringType(),
    "int8range": T.StringType(),
    "numrange": T.StringType(),
    "tsrange": T.StringType(),
    "tstzrange": T.StringType(),
    "daterange": T.StringType(),
}


def uuid_to_binary(col: str) -> Column:
    """Hex UUID string -> 16-byte binary (the reference's
    FixedSizeBinary(16) representation)."""
    return F.unhex(F.regexp_replace(F.col(col), "-", ""))


def time_to_micros(col: str) -> Column:
    """``HH:MM:SS[.ffffff]`` string -> microseconds since midnight BIGINT,
    truncating to us exactly like the reference (postgres.rs:401-405)."""
    c = F.col(col)
    h = F.split(c, ":").getItem(0).cast("long")
    m = F.split(c, ":").getItem(1).cast("long")
    sec = F.split(c, ":").getItem(2).cast("double")
    return (
        (h * 3600 + m * 60) * 1_000_000
        + F.floor(sec * 1_000_000).cast("long")
    )


def _nums(expr: str) -> str:
    """Spark SQL: all decimal numbers in a geo text literal, in order, as
    array<double> (JVM regexp, no UDF)."""
    return (
        f"transform(regexp_extract_all({expr}, '-?[0-9]+(\\\\.[0-9]+)?([eE][-+]?[0-9]+)?', 0), "
        f"x -> CAST(x AS DOUBLE))"
    )


def parse_point(col: str) -> Column:
    """``(x,y)`` -> [x, y]."""
    return F.expr(_nums(col))


def parse_circle(col: str) -> Column:
    """``<(x,y),r>`` -> [x, y, r]."""
    return F.expr(_nums(col))


def parse_box(col: str) -> Column:
    """``(x1,y1),(x2,y2)`` -> [x1, y1, x2, y2]."""
    return F.expr(_nums(col))


def parse_lseg(col: str) -> Column:
    """``[(x1,y1),(x2,y2)]`` -> [x1, y1, x2, y2]."""
    return F.expr(_nums(col))


def parse_line(col: str) -> Column:
    """``{a,b,c}`` of ax+by+c=0 -> [a, b, c] (reference postgres.rs:29-65)."""
    return F.expr(_nums(col))


def parse_polygon(col: str) -> Column:
    """``((x1,y1),...)`` -> [x1, y1, ...]."""
    return F.expr(_nums(col))


def parse_path(col: str) -> Column:
    """Path text -> [is_open, n_points, x1, y1, ...] (reference encoding,
    postgres.rs:185-240): ``[...]`` = open path, ``(...)`` = closed."""
    nums = _nums(col)
    is_open = F.when(F.col(col).startswith("["), F.lit(1.0)).otherwise(F.lit(0.0))
    n_points = (F.size(F.expr(nums)) / 2).cast("double")
    return F.concat(F.array(is_open, n_points), F.expr(nums))


GEO_PARSERS = {
    "point": parse_point,
    "line": parse_line,
    "circle": parse_circle,
    "box": parse_box,
    "lseg": parse_lseg,
    "path": parse_path,
    "polygon": parse_polygon,
}


# -- binary wire-format decoders --------------------------------------------
#
# The reference decodes the Postgres *binary* wire forms (postgres.rs:29-290:
# big-endian f64 components; path = flag byte + int32 count + pairs).  Over
# JDBC those bytes are unreachable (pgJDBC surfaces PGobject text, which the
# text parsers above handle), but byte-form geo shows up when ingesting
# COPY BINARY dumps or bytea-staged columns into parquet -- these decoders
# cover that path with the same output encodings as the text parsers.
#
# Divergence note: for polygon the reference folds the 4-byte point-count
# header into the first coordinate's bytes (postgres.rs:245-260 reads f64
# chunks from offset 0); the actual wire format is int32 npts + pairs, which
# is what we decode -- our output matches the documented [x1, y1, ...]
# encoding, not the reference's bug.

_GEO_FIXED_WIDTH = {"point": 2, "line": 3, "circle": 3, "box": 4, "lseg": 4}


def _decode_geo_bytes(pg_type: str, raw: bytes | None) -> list[float] | None:
    import struct

    if raw is None:
        return None
    raw = bytes(raw)
    if pg_type in _GEO_FIXED_WIDTH:
        n = _GEO_FIXED_WIDTH[pg_type]
        return list(struct.unpack(f">{n}d", raw[: 8 * n]))
    if pg_type == "path":
        # byte 0: open flag; bytes 1-5: int32 point count; then x/y pairs.
        is_open = 1.0 if raw[0] else 0.0
        n_points = int.from_bytes(raw[1:5], "big")
        coords = struct.unpack(f">{2 * n_points}d", raw[5 : 5 + 16 * n_points])
        return [is_open, float(n_points), *coords]
    if pg_type == "polygon":
        n_points = int.from_bytes(raw[0:4], "big")
        return list(
            struct.unpack(f">{2 * n_points}d", raw[4 : 4 + 16 * n_points])
        )
    raise ValueError(f"not a binary-decodable geo type: {pg_type!r}")


def decode_geo_binary(col: str, pg_type: str) -> Column:
    """``binary`` column in Postgres wire format -> ``array<double>`` with
    the engine's geo encodings (same outputs as the text parsers).
    Arrow-batched pandas UDF: geo payloads are tens of bytes, so the decode
    is memory-bandwidth work, not a hot loop."""
    from pyspark.sql.functions import pandas_udf

    if pg_type not in _GEO_FIXED_WIDTH and pg_type not in ("path", "polygon"):
        raise ValueError(f"not a binary-decodable geo type: {pg_type!r}")

    def dec(s):
        return s.map(lambda b: _decode_geo_bytes(pg_type, b))

    udf = pandas_udf(dec, T.ArrayType(T.DoubleType()))
    return udf(F.col(col))


class UnsupportedPgTypeError(ValueError):
    """A result column's Postgres type is outside the bridge's mapping.

    The reference PANICS with only the type OID (postgres.rs:642); the
    SURVEY 1.3 contract here is a clean error that lists EVERY offending
    column with its reported type and what to do about it."""

    def __init__(self, offenders: dict[str, str]):
        self.offenders = dict(offenders)
        cols = ", ".join(f"{c} ({t})" for c, t in sorted(offenders.items()))
        super().__init__(
            f"unbridgeable Postgres type(s) in result: {cols}. "
            "Cast the column in SQL (e.g. ::text), extend PG_TO_SPARK, "
            "or open the source with type_bridge=False to take the raw "
            "JDBC representation."
        )


def bridgeable_pg_types() -> set[str]:
    """Every normalized pg type name the bridge knows how to land."""
    return (
        set(PG_TO_SPARK) | set(REFERENCE_UNSUPPORTED) | set(GEO_PARSERS)
    )


def apply_pg_casts(df: DataFrame, column_pg_types: dict[str, str]) -> DataFrame:
    """Post-read cast layer for a JDBC-loaded DataFrame: given the original
    Postgres type per column (as the reference records in
    ``Column.original_type_repr``, schema.rs:144-165), normalize to the
    engine's mapping -- geo text -> array<double>, time -> us bigint.

    Columns whose reported type is outside the bridge's matrix raise
    :class:`UnsupportedPgTypeError` naming all of them at once -- the
    clean-error half of the SURVEY 1.3 contract (the reference panics
    with a bare OID instead)."""
    known = bridgeable_pg_types()
    offenders = {
        name: pg_type
        for name, pg_type in column_pg_types.items()
        if name in df.columns and pg_type.lower() not in known
    }
    if offenders:
        raise UnsupportedPgTypeError(offenders)
    for name, pg_type in column_pg_types.items():
        if name not in df.columns:
            continue
        pg = pg_type.lower()
        if pg in GEO_PARSERS:
            df = df.withColumn(name, GEO_PARSERS[pg](name))
        elif pg == "time":
            df = df.withColumn(name, time_to_micros(name))
    return df
