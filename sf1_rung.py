#!/usr/bin/env python
"""The 10x scale rung: build an SF1 dataset (6M-row lineitem -- the
reference's exact SF1 row count, BASELINE.md:17) and time the headline
queries on it.

The driver ships sf0.001/0.01/0.1 only, so SF1 is derived here by 10-fold
replication of sf0.1 with per-replica decorrelation, preserving schema,
per-table distributions, and join integrity:

* fact/dim keys get a per-replica offset (joins stay 1:N exactly as at
  sf0.1 -- each replica is a self-contained star);
* documents.text goes through a per-replica bijective letter permutation
  (rotation of a 10-letter alphabet): within-replica duplicate structure
  is preserved exactly, cross-replica shingle overlap vanishes;
* embeddings are component-rotated (orthogonal transform: within-replica
  cosines bit-identical, cross-replica cosines scrambled).

Output dir: ./testdata_sf1 (gitignored, ~150 MB).  One JSON line to
stdout with median-of-warm-runs timings for q01/q02/q05/q12 at SF1.

Run: python sf1_rung.py            (builds if absent, then times)
     python sf1_rung.py --rebuild  (force rebuild)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

K = 10
OFF = 100_000_000
ALPHA = "aeiousrtln"  # 10 frequent letters -> 10 distinct rotations
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "testdata_sf1")
TIMED = ("q01_full_scan", "q02_projection", "q05_min_max_metadata", "q12_groupby_agg")


DIGITS = "0123456789"


def build(
    spark,
    src_dir: str,
    k: int = K,
    out_dir: str = SF1_DIR,
    alpha: str = ALPHA,
    off: int = OFF,
    roll_mult: int = 7,
    rotate_digits: bool = False,
) -> None:
    """Replicate ``src_dir`` ``k``-fold with per-replica decorrelation.

    ``alpha``/``off``/``roll_mult`` parameterize the decorrelators so a
    second rung can stack on the first (sf10_rung.py replicates the SF1
    output with a DISJOINT letter alphabet: letter-disjoint permutations
    compose to k1*k2 distinct permutations, where re-using one alphabet
    would collapse to k1 -- rotations of the same set compose mod k1).

    ``rotate_digits`` additionally rotates ``0-9`` by the replica index.
    Letter-only rotation leaves DIGIT shingles identical across replicas,
    so each source doc's k clones share their numeric tokens: harmless at
    k=10 (the documented 1.69x raw-candidate inflation the DF/skew
    filters absorb), but at the stacked 100 replicas the clone families'
    shared-shingle minhash bands collide ~100-wide and the candidate
    relation goes quadratic -- the first SF10 x07 attempt filled 34 GB of
    shuffle before dying on disk.  Digit rotation breaks the families
    apart while staying bijective (within-replica duplicate structure is
    still preserved exactly)."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(k).select(F.col("id").alias("rep"))

    def replicate(name, key_cols=(), n_files=8, transform=None):
        df = spark.read.parquet(f"{src_dir}/{name}.parquet")
        out = df.crossJoin(rep)
        for c in key_cols:
            dt = df.schema[c].dataType.simpleString()
            out = out.withColumn(
                c, (F.col(c) + F.col("rep") * off).cast(dt)
            )
        if transform is not None:
            out = transform(out)
        (
            out.drop("rep")
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{name}.parquet")
        )

    def rotate_text(out):
        expr = F.col("text")
        for i in range(1, k):
            rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
            src, dst = alpha, rot
            if rotate_digits:
                drot = DIGITS[i % 10:] + DIGITS[: i % 10]
                src, dst = alpha + DIGITS, rot + drot
            expr = F.when(
                F.col("rep") == i, F.translate(F.col("text"), src, dst)
            ).otherwise(expr)
        return out.withColumn("text", expr)

    def roll_vec(out):
        expr = F.col("embedding")
        for i in range(1, k):
            r = (i * roll_mult) % 64
            expr = F.when(
                F.col("rep") == i,
                F.expr(
                    f"concat(slice(embedding, {r + 1}, {64 - r}), "
                    f"slice(embedding, 1, {r}))"
                ).cast(out.schema["embedding"].dataType.simpleString()),
            ).otherwise(expr)
        return out.withColumn("embedding", expr)

    replicate("lineitem", ("l_orderkey", "l_partkey", "l_suppkey"), 32)
    replicate("orders", ("o_orderkey", "o_custkey"), 16)
    replicate("customer", ("c_custkey",), 4)
    replicate("part", ("p_partkey",), 4)
    replicate("supplier", ("s_suppkey",), 2)
    replicate("events", ("event_id", "user_id"), 16)
    replicate("documents", ("doc_id",), 4, transform=rotate_text)
    replicate("embeddings", ("vec_id",), 4, transform=roll_vec)
    for small in ("nation", "region"):
        df = spark.read.parquet(f"{src_dir}/{small}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/{small}.parquet"
        )


def main() -> None:
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from conecta_spark.queries import REGISTRY, _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-sf1",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    marker = os.path.join(SF1_DIR, "lineitem.parquet", "_SUCCESS")
    if "--rebuild" in sys.argv or not os.path.exists(marker):
        t0 = time.perf_counter()
        build(spark, src_dir)
        print(
            f"built SF1 in {time.perf_counter() - t0:.1f}s", file=sys.stderr
        )

    n_lineitem = spark.read.parquet(f"{SF1_DIR}/lineitem.parquet").count()

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    timings = {}
    for name in TIMED:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(5):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(fn(spark, SF1_DIR))
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(sorted(runs[1:])), 3)
        print(f"{name}: median {timings[name]}s runs={runs}", file=sys.stderr)

    block = {
        "lineitem_rows": n_lineitem,
        "timings_sec": timings,
        "reference_sf1_scan_sec": 1.796,  # BASELINE.md:17
        "scan_vs_reference": round(timings["q01_full_scan"] / 1.796, 2),
        "load_end": round(os.getloadavg()[0], 1),
    }
    # merge into the shared rung artifact so all three scale points
    # (sf1 / sf10 / sf20) record numbers from one code version
    rung_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SF10_RUNG.json"
    )
    try:
        with open(rung_path) as f:
            rung = json.load(f)
    except OSError:
        rung = {}
    rung["sf1"] = block
    with open(rung_path, "w") as f:
        json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "sf1_rung", **block}, separators=(",", ":")))


if __name__ == "__main__":
    main()
