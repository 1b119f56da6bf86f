#!/usr/bin/env python
"""Dump .explain("formatted") for every registry entry into
plans/r13/<prefix>_<suffix>.txt (suffix = before/after, argv[1]).

Usage: python dump_plans_r13.py before [entry_prefix ...]

Heavy operator entries do eager work (persist/count) at DataFrame
construction time; that is fine here -- we want the final consumed plan,
exactly what the bench's noop write executes.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    from conecta_spark.session import get_session

    spark = get_session(
        app_name=f"plan-dump-r13-{suffix}",
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from conecta_spark.queries import queries

    for name, fn in sorted(queries().items()):
        prefix = name.split("_", 1)[0]
        if only and prefix not in only and name not in only:
            continue
        path = os.path.join(out_dir, f"{prefix}_{suffix}.txt")
        try:
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN DUMP FAILED: {ex}"
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}, sf_dir={sf_dir})\n")
            f.write(plan)
        print("ok", name, flush=True)


if __name__ == "__main__":
    main()
