#!/usr/bin/env python
"""Continuous-trigger streaming-ingest rung (r11 verdict task 5):
``stream_mine_and_append`` driven by a REAL processing-time trigger over
a GROWING directory -- the 100 TB shape its docstring claims -- instead
of the proven-but-bounded ``availableNow`` replay.

Flow, on the SF10 corpus (500k docs, ids ingestion-ordered):

* store built on the oldest 60%; the newest 40% is split into THREE
  id-slices staged as one parquet file each;
* the stream starts on an EMPTY staging directory with
  ``trigger={"processingTime": "2 seconds"}`` + ``maxFilesPerTrigger=1``
  (so each arriving file is one micro-batch), and the writer drops the
  three files in while it runs -- a genuinely growing source;
* the run is ACCEPTED when the store's manifest has committed >= 3
  epochs (one per file); the query is then stopped by the caller (the
  continuous contract: the sink body never knows the trigger);
* a RESTART with the same checkpoint (availableNow) must append ZERO
  new batches -- replay is a manifest no-op across trigger modes;
* the union of per-epoch pair sets must EQUAL the hand-written batch
  daily loop over the same slices against a twin store.

Writes a ``stream_store_triggered_500k`` block into SF10_RUNG.json and
prints one JSON line.  Run: python stream_trigger_rung.py  (requires
testdata_sf10; STREAM_TRIGGER_SF=/root/testdata/sf0.1 smokes without
writing the artifact).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

CAP = int(os.environ.get("STREAM_TRIGGER_CAP", "100"))
WORK = os.environ.get(
    "STREAM_TRIGGER_DIR", "/tmp/conecta_spark_stream_trigger"
)
N_SLICES = 3
TIMEOUT_S = 1800


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
        app_name="conecta-spark-stream-trigger",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("STREAM_TRIGGER_SF", "") or sf10_rung.SF10_DIR
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    fracs = [0.6 + 0.4 * i / N_SLICES for i in range(N_SLICES)]
    cuts = [
        int(
            docs.selectExpr(
                f"percentile_disc({f}) WITHIN GROUP (ORDER BY doc_id) AS c"
            ).first()["c"]
        )
        for f in fracs
    ]
    base = docs.where(F.col("doc_id") < cuts[0])

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    store_stream = os.path.join(WORK, "store_stream")
    store_batch = os.path.join(WORK, "store_batch")
    t0 = time.perf_counter()
    write_signature_store(base, store_stream)
    build_sec = round(time.perf_counter() - t0, 3)
    shutil.copytree(store_stream, store_batch)

    # pre-render the slice files; they move into staging WHILE the
    # stream runs (a genuinely growing directory)
    bounds = [
        (cuts[i], cuts[i + 1] if i + 1 < N_SLICES else None)
        for i in range(N_SLICES)
    ]
    pending = []
    slice_docs = []

    def _slice(i):
        lo, hi = bounds[i]
        sl = docs.where(F.col("doc_id") >= lo)
        if hi is not None:
            sl = sl.where(F.col("doc_id") < hi)
        return sl

    for i in range(N_SLICES):
        sl = _slice(i)
        slice_docs.append(sl.count())
        tmp = os.path.join(WORK, f"slice{i}")
        sl.coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        pending.append((os.path.join(tmp, part), f"{i:04d}.parquet"))

    staging = os.path.join(WORK, "staging")
    os.makedirs(staging)
    pairs_path = os.path.join(WORK, "pairs")
    ckpt = os.path.join(WORK, "ckpt")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    t_start = time.perf_counter()
    q = stream_mine_and_append(
        stream,
        store_stream,
        pairs_path,
        ckpt,
        threshold=0.5,
        max_band_width=CAP,
        trigger={"processingTime": "2 seconds"},
    )
    assert q is not None  # continuous mode returns the live query
    try:
        # drop the files in while the stream runs; accept once the
        # manifest shows all three epochs committed
        epoch_walls = []
        for i, (src, name) in enumerate(pending):
            drop_t = time.perf_counter()
            shutil.move(src, os.path.join(staging, name))
            while time.perf_counter() - t_start < TIMEOUT_S:
                m = read_manifest(store_stream)
                if len(m["applied_batches"]) >= i + 1:
                    break
                time.sleep(1.0)
            else:
                raise RuntimeError("triggered ingest timed out")
            epoch_walls.append(round(time.perf_counter() - drop_t, 3))
    finally:
        q.stop()
    stream_sec = round(time.perf_counter() - t_start, 3)
    m_stream = read_manifest(store_stream)
    n_epochs = len(m_stream["applied_batches"])

    streamed: set = set()
    for d in sorted(glob.glob(os.path.join(pairs_path, "epoch-*"))):
        streamed |= {
            (r.doc_a, r.doc_b) for r in spark.read.parquet(d).collect()
        }

    # restart with the same checkpoint (availableNow drains nothing):
    # zero new batches across trigger modes
    restart_stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    stream_mine_and_append(
        restart_stream, store_stream, pairs_path, ckpt,
        threshold=0.5, max_band_width=CAP,
    )
    m_restart = read_manifest(store_stream)

    # batch twin: the same slices through the hand-written daily loop
    batch_union: set = set()
    t0 = time.perf_counter()
    for i in range(N_SLICES):
        sl = _slice(i)
        batch_union |= {
            (r.doc_a, r.doc_b)
            for r in incremental_pairs_stored(
                spark, store_batch, sl, threshold=0.5, max_band_width=CAP
            ).collect()
        }
        append_batch(spark, store_batch, sl, batch_id=f"day-{i:03d}")
    batch_sec = round(time.perf_counter() - t0, 3)

    block = {
        "docs": n,
        "base_docs": int(m_stream["n_docs"]),
        "slice_docs": slice_docs,
        "cap": CAP,
        "trigger": "processingTime=2 seconds",
        "store_build_sec": build_sec,
        "stream_run_sec": stream_sec,
        "epoch_walls_sec": epoch_walls,
        "batch_loop_sec": batch_sec,
        "epochs_committed": n_epochs,
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
    if not os.environ.get("STREAM_TRIGGER_SF"):
        rung["stream_store_triggered_500k"] = block
        with open(rung_path, "w") as f:
            json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "stream_trigger_rung", **block}))
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
