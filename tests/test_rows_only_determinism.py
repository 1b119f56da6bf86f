"""Determinism of the seeded-ml metric-oracle entries.

Through r5 this file checked the rows-only entries (no DuckDB oracle);
as of r6 every entry is oracled, and the former rows-only set
(x09/x13/x14) carries acceptance flags measured against seeded ml paths
(MinHashLSH, BRP-LSH, KMeans).  Those flags are only trustworthy if the
ml side is deterministic per corpus: the same query twice in one session
must return the identical row multiset -- seeded hash families, no time-
or partition-order-dependence.  A nondeterministic ml path would make a
driver row flicker red across rounds with no code change.
"""

from __future__ import annotations

import pytest

from conecta_spark.queries import REGISTRY, _load_extensions

_load_extensions()

_SEEDED_ML = [
    "x09_dedup_minhash_ml",
    "x13_ann_brp_ml",
    "x14_ann_ivf_ml",
]


def _multiset(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", _SEEDED_ML)
def test_seeded_ml_entry_is_deterministic(name, spark, oracle_dir):
    a = _multiset(REGISTRY[name].fn(spark, oracle_dir))
    b = _multiset(REGISTRY[name].fn(spark, oracle_dir))
    assert a == b, f"{name} differs between two runs in one session"
    assert sum(a.values()) > 0, name
