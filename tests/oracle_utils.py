"""Local replica of the driver's DuckDB-oracle compare: row-count + schema
(column names) + order-insensitive value multiset."""

from __future__ import annotations

import datetime
import math

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{_canon_value(v[k])}" for k in sorted(v)
        ) + "}"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [
        "\x1f".join(_canon_value(row[i]) for i in order) for row in rows
    ]
    out.sort()
    return out


def spark_result(df):
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duckdb_result(con, sql: str):
    rel = con.sql(sql)
    return list(rel.columns), rel.fetchall()


# The driver compares pandas frames, not Python values: a DuckDB HUGEINT
# (any SUM over integers) lands in pandas as float64 ("11992.0") while the
# Spark BIGINT stays int64 ("11992"), so the driver hash-mismatches even
# though fetchall()'s Python ints stringify identically.  x56 shipped red
# in round 4 exactly this way.  Compare numeric KINDS (int vs float) from
# the engines' own static types -- no extra execution -- and reject
# pandas-lossy oracle output types outright.
_DUCK_LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL")
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "REAL"}
_SPARK_INT = {"byte", "short", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def _duck_kind(type_str: str) -> str | None:
    t = type_str.upper()
    if any(t.startswith(l) for l in _DUCK_LOSSY):
        return "lossy"
    if t in _DUCK_INT:
        return "i"
    if t in _DUCK_FLOAT:
        return "f"
    return None


def _spark_kind(type_str: str) -> str | None:
    t = type_str.lower()
    if t.startswith("decimal"):
        return "lossy"
    if t in _SPARK_INT:
        return "i"
    if t in _SPARK_FLOAT:
        return "f"
    return None


def assert_numeric_kinds_match(name: str, spark_df, con, oracle: str):
    """Driver-style dtype gate: every numeric output column must be
    integer on both engines or float on both engines, and neither side
    may emit a type pandas degrades (HUGEINT/DECIMAL)."""
    rel = con.sql(oracle)
    d_kinds = {
        c: _duck_kind(str(t)) for c, t in zip(rel.columns, rel.types)
    }
    s_kinds = {
        f.name: _spark_kind(f.dataType.simpleString())
        for f in spark_df.schema.fields
    }
    for col, dk in sorted(d_kinds.items()):
        sk = s_kinds.get(col)
        if dk == "lossy" or sk == "lossy":
            raise AssertionError(
                f"{name}.{col}: pandas-lossy type (duck={dk} spark={sk}) "
                f"-- CAST the oracle (e.g. SUM(int) -> HUGEINT needs "
                f"CAST(... AS BIGINT)) or the Spark column"
            )
        if dk in ("i", "f") and sk in ("i", "f") and dk != sk:
            raise AssertionError(
                f"{name}.{col}: numeric kind mismatch duck={dk} spark={sk}"
                f" -- the driver's pandas hash will diverge"
            )


# --- the driver's own comparison semantics, shared by every gate -----------
#
# driver_twin.py (window gate), oracle_sweep.py (10x sweep), and
# tests/test_oracle_types.py (static dtype audit) must all agree with the
# driver about iteration order and pandas-level canonicalization; factored
# here so they cannot drift independently (r5 verdict task 8).


def iter_registry():
    """Yield (name, QueryDef) in the DRIVER's iteration order -- the order
    ``__spark_entry__.queries()`` emits, whose first 50 entries are the
    CORRECTNESS window."""
    from conecta_spark.queries import REGISTRY, _ordered

    return [(q.name, REGISTRY[q.name]) for q in _ordered()]


def pandas_canon(df):
    """The driver's frame canonicalization: floats rounded to 6dp, every
    cell stringified, rows sorted."""
    df = df.copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.astype(str).sort_values(list(df.columns)).reset_index(drop=True)


def pandas_compare(sdf, ddf) -> list[str]:
    """Driver-faithful pandas-level compare: row count, column set, dtype
    KIND per column (int-vs-float divergence hashes differently even when
    values match), then canonicalized values.  Returns problems, [] if
    green."""
    problems = []
    if len(sdf) != len(ddf):
        problems.append(f"rows {len(sdf)} vs {len(ddf)}")
    if sorted(sdf.columns) != sorted(ddf.columns):
        problems.append("columns")
        return problems
    s = sdf[sorted(sdf.columns)].copy()
    d = ddf[sorted(ddf.columns)].copy()
    for c in s.columns:
        ks, kd = s[c].dtype.kind, d[c].dtype.kind
        if ks != kd and not {ks, kd} <= {"O", "M"}:
            problems.append(f"dtype {c}: {ks} vs {kd}")
    if not problems and not pandas_canon(s).equals(pandas_canon(d)):
        problems.append("values")
    return problems


def assert_match(name: str, spark_df, con, oracle: str) -> int:
    """Full cross-engine comparison; returns the matched ROW COUNT so
    callers can reject vacuous greens (a hash match on two empty frames
    proves nothing -- x11 shipped six rounds of 0-vs-0 greens that way)."""
    assert_numeric_kinds_match(name, spark_df, con, oracle)
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duckdb_result(con, oracle)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_canon = canonical_rows(s_cols, s_rows)
    d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duck): {diffs}"
        )
    return len(s_rows)
