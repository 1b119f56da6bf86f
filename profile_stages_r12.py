#!/usr/bin/env python
"""Per-stage profile of registry entries via the Spark event log.

Usage: python profile_stages_r12.py x11 x14 ...
For each entry: two warm-up runs, then a timed run bracketed by job-group
markers; afterwards the event log is parsed and the stages of the timed
run are printed by descending wall time (with task-time sums and names).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark-events-r12"


def main() -> None:
    os.makedirs(EVDIR, exist_ok=True)
    from conecta_spark.session import get_session

    spark = get_session(
        app_name="profile-stages-r12",
        master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]",
        extra_conf={
            "spark.sql.shuffle.partitions": os.environ["SPARK_GRAFT_CPUS"],
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from conecta_spark.queries import queries

    qs = queries()
    sc = spark.sparkContext

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    import bench as _b

    run(
        spark.range(32 * 4, numPartitions=32).mapInPandas(
            _b._warm_worker, "id long"
        )
    )

    targets = sys.argv[1:] or ["x11"]
    windows = {}
    for prefix in targets:
        name = next(n for n in qs if n.startswith(prefix))
        fn = qs[name]
        for _ in range(2):
            spark.catalog.clearCache()
            run(fn(spark, SF_DIR))
        spark.catalog.clearCache()
        t0 = time.time() * 1000.0
        w0 = time.perf_counter()
        run(fn(spark, SF_DIR))
        wall = time.perf_counter() - w0
        t1 = time.time() * 1000.0
        windows[name] = (t0, t1, wall)

    app_id = sc.applicationId
    spark.stop()
    time.sleep(1.0)

    logs = sorted(
        glob.glob(os.path.join(EVDIR, f"*{app_id}*"))
        + glob.glob(os.path.join(EVDIR, f"*{app_id}*", "events_*"))
    )
    logs = [p for p in logs if os.path.isfile(p)]
    stages = []  # (submit_ms, complete_ms, name, ntasks)
    task_time = {}  # stage_id -> run time sum (s)
    py_time = {}
    with open(logs[-1]) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            et = ev.get("Event")
            if et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages.append(
                    (
                        si.get("Submission Time", 0),
                        si.get("Completion Time", 0),
                        si.get("Stage Name", "")[:100],
                        si.get("Number of Tasks", 0),
                        si.get("Stage ID"),
                    )
                )
            elif et == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                tm = ev.get("Task Metrics") or {}
                task_time[sid] = task_time.get(sid, 0.0) + tm.get(
                    "Executor Run Time", 0
                ) / 1000.0

    for name, (t0, t1, wall) in windows.items():
        mine = [s for s in stages if s[0] >= t0 - 50 and s[1] <= t1 + 50]
        mine.sort(key=lambda s: -(s[1] - s[0]))
        tot_stage = sum(s[1] - s[0] for s in mine) / 1000.0
        print(
            f"\n=== {name}: wall {wall:.2f}s, {len(mine)} stages, "
            f"stage-wall sum {tot_stage:.2f}s ==="
        )
        for sub, comp, sname, nt, sid in mine[:15]:
            print(
                f"  wall={(comp - sub) / 1000.0:6.2f}s "
                f"taskSum={task_time.get(sid, 0.0):7.2f}s "
                f"tasks={nt:4d} {sname}"
            )


if __name__ == "__main__":
    main()
