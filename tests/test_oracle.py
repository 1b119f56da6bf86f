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


#: Entries whose green rows were once VACUOUS (x11 greened 0-row-vs-0-row
#: at every SF through r6 because its threshold sat above the corpus's
#: entire cosine distribution).  A hash match on empty frames proves
#: nothing; these entries must produce rows at the correctness-gate SF so
#: the oracle exercises actual values.
_MUST_BE_NONEMPTY = ("x11_embed_near_dup",)


@pytest.mark.parametrize("name", _MUST_BE_NONEMPTY)
def test_oracle_exercises_rows(name, spark, oracle_dir):
    assert REGISTRY[name].fn(spark, oracle_dir).count() > 0
