"""Single-entry micro-bench mirroring bench.py's methodology (noop sink,
cache cleared between runs, run 1 warm-up, median of the rest) for an
explicit subset of registry entries -- used in r12 to separate genuine
code regressions from co-tenant load bursts on named entries.

Usage: python bench_subset_r12.py x14 x09 x13 q12 [...]
"""
import os
import statistics
import sys
import time


def main() -> None:
    prefixes = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from conecta_spark.session import get_session

    spark = get_session(
        app_name="conecta-spark-bench-subset",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.driver.extraJavaOptions": "-Xlog:disable",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from conecta_spark.queries import queries

    qs = queries()
    picked = {
        n: f for n, f in qs.items() if n.split("_", 1)[0] in prefixes
    }

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    run(next(iter(qs.values()))(spark, sf_dir))

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from batches

    run(
        spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
            _warm, "id long"
        )
    )

    for name, fn in sorted(picked.items()):
        runs = []
        for attempt in range(6):
            spark.catalog.clearCache()
            start = time.perf_counter()
            run(fn(spark, sf_dir))
            runs.append(time.perf_counter() - start)
            if attempt >= 3 and min(runs) > 0.8 * min(runs[:-1]):
                break
        timed = sorted(runs[1:])
        print(
            f"{name}: median={statistics.median(timed):.3f} "
            f"min={min(runs):.3f} runs={[round(r, 3) for r in runs]} "
            f"load={round(os.getloadavg()[0], 1)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
