#!/usr/bin/env python
"""Streaming-ingestion rung for the signature store: the daily loop
driven by Structured Streaming (foreachBatch) instead of a hand-written
batch loop, proven equal to it and restart-idempotent at the 500k rung.

Two id-slices of the SF10 corpus's newest 40% are staged as one parquet
file each; ``maxFilesPerTrigger=1`` + ``availableNow`` turns them into
two micro-batches in arrival order.  ``stream_mine_and_append`` mines
each epoch against the current store (which already holds every earlier
epoch) and appends it, with ``batch_id = epoch-<id>`` carrying the
store's manifest idempotency.  What the numbers must show:

* the union of per-epoch pair sets EQUALS the batch daily-loop's union
  over the same slices against a twin store (pairs_equal);
* a RESTART of the completed run with the same checkpoint appends zero
  new batches (restart_appended == 0) -- replay is a manifest no-op.

Writes a ``stream_store_500k`` block into SF10_RUNG.json and prints one
JSON line.  Run: python stream_store_rung.py   (requires testdata_sf10;
STREAM_STORE_SF=/root/testdata/sf0.1 smokes without writing the
artifact).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

CAP = int(os.environ.get("STREAM_STORE_CAP", "100"))
WORK = os.environ.get("STREAM_STORE_DIR", "/tmp/conecta_spark_stream_store")


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import sf10_rung
    from conecta_spark.operators.minhash_store import (
        append_batch,
        incremental_pairs_stored,
        read_manifest,
        stream_mine_and_append,
        write_signature_store,
    )
    from conecta_spark.queries import _load_extensions
    from conecta_spark.session import get_session

    _load_extensions()
    spark = get_session(
        app_name="conecta-spark-stream-store",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("STREAM_STORE_SF", "") or sf10_rung.SF10_DIR
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    cuts = [
        int(
            docs.selectExpr(
                f"percentile_disc({f}) WITHIN GROUP (ORDER BY doc_id) AS c"
            ).first()["c"]
        )
        for f in (0.6, 0.8)
    ]
    base = docs.where(F.col("doc_id") < cuts[0])

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    store_stream = os.path.join(WORK, "store_stream")
    store_batch = os.path.join(WORK, "store_batch")
    t0 = time.perf_counter()
    write_signature_store(base, store_stream)
    build_sec = round(time.perf_counter() - t0, 3)
    # twin store for the batch loop: copy rather than rebuild (bitwise-
    # identical base, so any pair diff is the ingestion mechanism's)
    shutil.copytree(store_stream, store_batch)

    # stage the two ingest slices as one parquet file each, mtime-ordered
    staging = os.path.join(WORK, "staging")
    os.makedirs(staging)
    bounds = [(cuts[0], cuts[1]), (cuts[1], None)]
    slice_docs = []
    for i, (lo, hi) in enumerate(bounds):
        sl = docs.where(F.col("doc_id") >= lo)
        if hi is not None:
            sl = sl.where(F.col("doc_id") < hi)
        slice_docs.append(sl.count())
        tmp = os.path.join(WORK, f"slice{i}")
        sl.coalesce(1).write.parquet(tmp)
        part = next(
            p for p in os.listdir(tmp) if p.endswith(".parquet")
        )
        dst = os.path.join(staging, f"{i:04d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, ns=(i * 10**9, i * 10**9))
        shutil.rmtree(tmp)

    def _stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )

    pairs_path = os.path.join(WORK, "pairs")
    ckpt = os.path.join(WORK, "ckpt")
    t0 = time.perf_counter()
    stream_mine_and_append(
        _stream(), store_stream, pairs_path, ckpt,
        threshold=0.5, max_band_width=CAP,
    )
    stream_sec = round(time.perf_counter() - t0, 3)
    m_stream = read_manifest(store_stream)
    streamed: set = set()
    for d in sorted(glob.glob(os.path.join(pairs_path, "epoch-*"))):
        streamed |= {
            (r.doc_a, r.doc_b) for r in spark.read.parquet(d).collect()
        }

    # batch twin: same slices through the hand-written daily loop
    t0 = time.perf_counter()
    batch_union: set = set()
    for i, (lo, hi) in enumerate(bounds):
        sl = docs.where(F.col("doc_id") >= lo)
        if hi is not None:
            sl = sl.where(F.col("doc_id") < hi)
        batch_union |= {
            (r.doc_a, r.doc_b)
            for r in incremental_pairs_stored(
                spark, store_batch, sl,
                threshold=0.5, max_band_width=CAP,
            ).collect()
        }
        append_batch(spark, store_batch, sl, batch_id=f"day-{i:03d}")
    batch_sec = round(time.perf_counter() - t0, 3)

    # restart: same checkpoint, nothing replays, nothing appends
    stream_mine_and_append(
        _stream(), store_stream, pairs_path, ckpt,
        threshold=0.5, max_band_width=CAP,
    )
    m_restart = read_manifest(store_stream)

    block = {
        "docs": n,
        "base_docs": int(m_stream["n_docs"]),
        "slice_docs": slice_docs,
        "cap": CAP,
        "store_build_sec": build_sec,
        "stream_run_sec": stream_sec,
        "batch_loop_sec": batch_sec,
        "epochs": m_stream["applied_batches"],
        "stream_pairs": len(streamed),
        "batch_pairs": len(batch_union),
        "pairs_equal": streamed == batch_union,
        "restart_appended": int(m_restart["n_appended"])
        - int(m_stream["n_appended"]),
        "load_end": round(os.getloadavg()[0], 1),
    }
    rung_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SF10_RUNG.json"
    )
    try:
        with open(rung_path) as f:
            rung = json.load(f)
    except OSError:
        rung = {}
    if not os.environ.get("STREAM_STORE_SF"):
        rung["stream_store_500k"] = block
        with open(rung_path, "w") as f:
            json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "stream_store_rung", **block}))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
