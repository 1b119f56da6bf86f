#!/usr/bin/env python
"""Run the full DuckDB-oracle sweep at an arbitrary scale factor.

The driver's correctness gate (and tests/test_oracle.py) runs at sf0.01;
this script re-runs the same compare at any directory -- the point is
sf0.1, 10x the gated data, where overflow/threshold/rounding bugs that
are invisible at the gate size would surface.  One JSON line to stdout:
{"sf_dir": ..., "checked": N, "passed": N, "rows_only": N, "failed": [...]}.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python oracle_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import traceback


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.oracle_utils import assert_match, duckdb_con, iter_registry

    from conecta_spark.session import get_session

    # r7 carried x06/x52 here as rows-only because their DuckDB oracles
    # were quadratic (per-pair list_intersect BNLJ; all-pairs NOT EXISTS
    # over 600k rows).  Both were rewritten sub-quadratic in r8 (x06:
    # inverted-index shingle equi-join; x52: SFS sample-skyline prune +
    # exact check among survivors), so the default skip set is EMPTY and
    # the sweep value-checks all 137.  The env override remains for
    # ad-hoc degradation.
    skip_oracle = set(
        filter(None, os.environ.get("ORACLE_SWEEP_ROWS_ONLY", "").split(","))
    )

    reg = iter_registry()
    spark = get_session(
        app_name="conecta-spark-oracle-sweep",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)

    passed, rows_only, failed = 0, 0, []
    for name, qd in reg:
        try:
            spark.catalog.clearCache()
            df = qd.fn(spark, sf_dir)
            if qd.oracle is None or name in skip_oracle:
                assert df.count() >= 0
                rows_only += 1
            else:
                assert_match(name, df, con, qd.oracle)
                passed += 1
            print(f"ok {name}", file=sys.stderr)
        except Exception as e:  # keep sweeping; report at the end
            failed.append(name)
            print(f"FAIL {name}: {e}", file=sys.stderr)
            traceback.print_exc(limit=3, file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "checked": len(reg),
                "passed": passed,
                "rows_only": rows_only,
                "failed": failed,
            },
            separators=(",", ":"),
        )
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
