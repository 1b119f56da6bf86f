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

from conecta_spark.queries import REGISTRY

from .oracle_utils import (
    assert_numeric_kinds_match,
    duckdb_con,
    iter_registry,
)

# Entries whose fn() EXECUTES jobs at build time (x65 runs a full
# availableNow streaming query; the cluster entries run the counts /
# bounded collects inside connected_components).  This audit is meant to
# be a cheap bind-plus-plan pass, so exclude them here -- their dtype
# parity is still covered by driver_twin.py's executing sweep.
_EAGER = {
    "x26_dedup_clusters",
    "x50_keep_best_per_cluster",
    "x65_streaming_hourly_parity",
    # r6 metric oracles: fn() runs the ml path (fits + bounded collects)
    # to measure the recall/precision acceptance flags
    "x09_dedup_minhash_ml",
    "x13_ann_brp_ml",
    "x14_ann_ivf_ml",
    "x67_dedup_clusters_distributed",
}

_ORACLED = [
    n
    for n, q in iter_registry()
    if q.oracle is not None and n not in _EAGER
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _ORACLED)
def test_oracle_output_types(name, spark, sf_dir, con):
    qd = REGISTRY[name]
    # Builds the plan only for the lazy entries audited here (_EAGER
    # lists the callables that run jobs at build time and are excluded).
    df = qd.fn(spark, sf_dir)
    assert_numeric_kinds_match(name, df, con, qd.oracle)
