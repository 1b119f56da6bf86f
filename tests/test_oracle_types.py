"""Registry-wide static type audit for the oracle SQL.

Round-4 lesson: the driver compares pandas frames, so a DuckDB HUGEINT
output column (any ``SUM`` over integers) becomes float64 and
hash-mismatches the Spark int64 even when every value is identical --
x56 shipped red exactly this way while the stringifying local harness
stayed green.  This test binds (does not execute) every registered
oracle and fails on any pandas-lossy output type, and cross-checks the
numeric kind (int vs float) of each column against the Spark plan's
schema.  An uncast integer SUM in any oracle now fails fast here, not
in a driver row three hours later.
"""

from __future__ import annotations

import pytest

from conecta_spark.queries import REGISTRY, _load_extensions

_load_extensions()

from .oracle_utils import assert_numeric_kinds_match, duckdb_con

_ORACLED = [n for n, q in REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_output_types(name, spark, sf_dir, con):
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_dir)  # builds the plan; nothing executes
    assert_numeric_kinds_match(name, df, con, qd.oracle)
