"""Schema-drift guard over the driver-provided testdata.

The testdata is regenerated between rounds (round 3: events.ts silently
moved from TIMESTAMP(NANOS) to naive timestamp[us], breaking every
timestamp consumer at the driver only).  Pin the column names and the
physical type families we depend on so the next regeneration fails HERE,
in one obvious test, instead of as scattered AnalysisExceptions inside 72
registry queries.

Reads parquet footers only -- no Spark job, runs in milliseconds.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .conftest import TESTDATA

# column -> predicate over the pyarrow type; only the properties the engine
# actually relies on (names for every query, type families for the columns
# with type-sensitive consumers).
_TYPE_CHECKS = {
    ("events", "ts"): lambda t: pa.types.is_timestamp(t),
    ("events", "user_id"): lambda t: pa.types.is_integer(t),
    ("events", "event_id"): lambda t: pa.types.is_integer(t),
    ("events", "value"): lambda t: pa.types.is_floating(t),
    ("documents", "text"): lambda t: pa.types.is_string(t)
    or pa.types.is_large_string(t),
    ("documents", "doc_id"): lambda t: pa.types.is_integer(t),
    ("embeddings", "embedding"): lambda t: pa.types.is_list(t)
    or pa.types.is_large_list(t)
    or pa.types.is_fixed_size_list(t),
    ("lineitem", "l_orderkey"): lambda t: pa.types.is_integer(t),
    ("lineitem", "l_quantity"): lambda t: pa.types.is_integer(t)
    or pa.types.is_floating(t)
    or pa.types.is_decimal(t),
    # date-like columns are physically naive timestamp[us] in the current
    # testdata generation; both Spark and DuckDB read them identically, so
    # either family is fine -- what matters is it stays temporal.
    ("lineitem", "l_shipdate"): lambda t: pa.types.is_date(t)
    or pa.types.is_timestamp(t),
    ("orders", "o_orderdate"): lambda t: pa.types.is_date(t)
    or pa.types.is_timestamp(t),
}

_EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"},
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
@pytest.mark.parametrize("table", sorted(_EXPECTED_COLUMNS))
def test_table_schema_contract(sf, table):
    path = os.path.join(TESTDATA, sf, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent in this deployment")
    schema = pq.read_schema(path)
    missing = _EXPECTED_COLUMNS[table] - set(schema.names)
    assert not missing, (
        f"{sf}/{table}: driver testdata dropped columns {sorted(missing)} "
        f"the engine queries; present: {schema.names}"
    )
    for (tbl, col), pred in _TYPE_CHECKS.items():
        if tbl != table or col not in schema.names:
            continue
        t = schema.field(col).type
        assert pred(t), (
            f"{sf}/{table}.{col}: physical type changed to {t}; "
            "audit every consumer (see round-3 events.ts regression)"
        )


def test_events_ts_unit_documented():
    """If ts ever moves to nanoseconds again, the streaming reader's
    normalize_event_ts long-branch must take over; surface the unit here so
    the change is noticed."""
    path = os.path.join(TESTDATA, "sf0.01", "events.parquet")
    t = pq.read_schema(path).field("ts").type
    assert pa.types.is_timestamp(t)
    assert t.unit in ("us", "ns", "ms"), t


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_documents_text_is_ascii(sf):
    """x18's multimodal oracle equates characters with UTF-8 bytes
    (DuckDB ascii()/length() vs the fake codec's byte arithmetic).  That
    is exact only while documents.text is pure ASCII; a regenerated
    corpus containing any multi-byte character would silently break the
    driver row.  Pin the assumption where the other corpus checks live."""
    import pyarrow.compute as pc

    path = os.path.join(TESTDATA, sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent in this deployment")
    text = pq.read_table(path, columns=["text"])["text"]
    chars = pc.utf8_length(text)
    octets = pc.binary_length(text.cast(pa.binary()))
    bad = pc.sum(pc.cast(pc.not_equal(chars, octets), pa.int64())).as_py()
    assert not bad, (
        f"{sf}/documents.text: {bad} rows contain multi-byte characters; "
        "x18's byte==char oracle (multimodal/ops.py) is no longer exact -- "
        "rewrite it in octet terms before shipping a driver row"
    )


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_documents_text_is_never_null(sf):
    """x69's DuckDB twin explodes n-grams then INNER-joins per-doc
    aggregates back, so a NULL-text document would vanish from the
    oracle while the Spark side still emits its (NULL-signal) row --
    a row-count mismatch by construction.  x68/x64 filter defensively;
    x69 relies on the corpus guarantee, so pin it."""
    path = os.path.join(TESTDATA, sf, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent in this deployment")
    text = pq.read_table(path, columns=["text"])["text"]
    assert text.null_count == 0, (
        f"{sf}/documents.text: {text.null_count} NULL rows; x69's oracle "
        "drops them while Spark keeps them -- add an IS NOT NULL filter "
        "to both sides of x69 before shipping a driver row"
    )
