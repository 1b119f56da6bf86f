"""Rows-only registry entries (no DuckDB oracle: ml internals, binary
plumbing, engine-specific sketches) get only a row-count check from the
driver.  The strongest local substitute is reproducibility: the same query
twice in one session must return the identical row multiset -- seeded LSH /
KMeans, no time- or partition-order-dependence.
"""

from __future__ import annotations

import pytest

from conecta_spark.queries import REGISTRY, _load_extensions

_load_extensions()

_ROWS_ONLY = [n for n, q in REGISTRY.items() if q.oracle is None]


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_is_deterministic(name, spark, oracle_dir):
    a = _multiset(REGISTRY[name].fn(spark, oracle_dir))
    b = _multiset(REGISTRY[name].fn(spark, oracle_dir))
    assert a == b, f"{name} differs between two runs in one session"
    assert sum(a.values()) > 0, name
