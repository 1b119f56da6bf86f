#!/usr/bin/env python
"""Local twin of the DRIVER's correctness gate, pandas-level.

tests/test_oracle.py compares Python values; the driver compares pandas
frames, where type degradation (DuckDB HUGEINT -> float64) can diverge
even when every Python value matches -- x56 shipped red in round 4
exactly that way while the local sweep stayed green.  This script
replays the driver's comparison faithfully for the first-50 window (the
slice CORRECTNESS_r{N}.json records): Spark ``toPandas()`` vs DuckDB
``.df()``, columns sorted by name, floats rounded to 6dp, values
compared as a sorted frame, and pandas dtype KINDS checked per column.

Run before round end:
    python driver_twin.py                 # window (first 50) at sf0.01
    DRIVER_TWIN_ALL=1 python driver_twin.py   # whole registry

One JSON line to stdout: {"checked": N, "green": N, "rows_only": N,
"bad": [...]}.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from tests.oracle_utils import duckdb_con, iter_registry, pandas_compare

    from conecta_spark.session import get_session

    spark = get_session(
        app_name="driver-twin",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)
    reg = iter_registry()
    if not os.environ.get("DRIVER_TWIN_ALL"):
        reg = reg[:50]

    green, rows_only, bad = 0, 0, []
    for name, qd in reg:
        try:
            sdf = qd.fn(spark, sf_dir).toPandas()
            if qd.oracle is None:
                assert len(sdf) >= 0
                rows_only += 1
                print(f"rows-only {name} ({len(sdf)})", file=sys.stderr)
                continue
            ddf = con.sql(qd.oracle).df()
            problems = pandas_compare(sdf, ddf)
            if problems:
                bad.append({"name": name, "problems": problems})
                print(f"FAIL {name}: {problems}", file=sys.stderr)
            else:
                green += 1
                print(f"ok {name}", file=sys.stderr)
        except Exception as e:
            bad.append({"name": name, "problems": [f"{type(e).__name__}: {e}"]})
            print(f"ERROR {name}: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "checked": len(reg),
                "green": green,
                "rows_only": rows_only,
                "bad": bad,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
