#!/usr/bin/env python
"""Production-sink rung for the streaming session family (r9 verdict
task 5): x72's native session_window aggregation written through a
CHECKPOINTED PARQUET APPEND sink instead of the driver-row memory sink,
at the SF10 10M-event rung -- proving the memory-sink mechanism the
driver rows use is not load-bearing for correctness.

Append mode only emits a session once the watermark passes its end, so
the file sink legitimately holds the watermark-CLOSED subset of the
complete-mode result; the rung accounts for that exactly rather than
hand-waving it:

* run the append query (one data batch -- the part files are not
  time-ordered, see the inline note -- plus the final flush batch where
  the watermark advances and the sink emits), read back the parquet,
  and take the final watermark from the query's last progress;
* compute the batch sessions (the x72 oracle: gap sessionization with
  end = last event + gap) and split them at the watermark;
* ``agree`` = the file-sink rows are SET-EQUAL (count + xxhash64 row
  hash, compared distributed -- no driver collect of 9M rows) to the
  closed batch subset, and a RESTART of the query on the same
  checkpoint with unchanged input appends ZERO new rows (exactly-once
  bookkeeping at scale, not just the small-corpus test).

Writes a ``streaming_sessions_file_sink`` block into SF10_RUNG.json
(non-destructive merge) and prints one JSON line.

Run: python file_sink_rung.py            (SF10; requires testdata_sf10)
     FILE_SINK_SF=/root/testdata/sf0.1 python file_sink_rung.py  (smoke)
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("FILE_SINK_SF", "")
WORK = os.environ.get("FILE_SINK_WORK", "/tmp/conecta_spark_file_sink_rung")
GAP_US = 1_800_000_000


def _wm_micros(progress_json: str) -> int:
    p = json.loads(progress_json)
    wm = p["eventTime"]["watermark"]  # e.g. 2024-01-01T00:00:00.000Z
    dt = datetime.datetime.fromisoformat(wm.replace("Z", "+00:00"))
    return int(dt.timestamp() * 1_000_000)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import sf10_rung

    sf_dir = SF_DIR or sf10_rung.SF10_DIR

    from conecta_spark.session import get_session
    from conecta_spark.streaming.events import (
        read_event_stream,
        sessionize_batch,
        streaming_session_windows,
    )

    spark = get_session(
        app_name="conecta-spark-file-sink-rung",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(int(cpus) * 2),
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    shutil.rmtree(WORK, ignore_errors=True)
    out = os.path.join(WORK, "sessions")
    ckpt = os.path.join(WORK, "ckpt")

    src = os.path.join(sf_dir, "events.parquet")
    # ONE data batch, not maxFilesPerTrigger-carved: the events part
    # files are shuffle-written, i.e. NOT time-ordered, so per-batch
    # watermark advancement over them drops later batches' rows as late
    # (measured: 8 batches emitted 2.47M of 9.54M closed sessions -- the
    # watermark hit max-1s after batch 1).  A real stream's files arrive
    # roughly in event-time order, which is what multi-batch watermarks
    # assume; bounded unordered REPLAY is semantically one batch + the
    # final flush batch (which is where the watermark advances and the
    # append sink emits -- still two micro-batch commits through the
    # checkpoint).  Multi-batch late-drop semantics are pinned at small
    # scale by tests/test_streaming.py::test_watermark_drops_late_events.

    def build_query():
        stream = read_event_stream(spark, sf_dir).withWatermark(
            "ts", "1 second"
        )
        return (
            streaming_session_windows(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
        )

    t0 = time.perf_counter()
    q = build_query().start()
    if not q.awaitTermination(1800):
        q.stop()
        raise RuntimeError("file-sink run did not terminate in 1800s")
    stream_sec = round(time.perf_counter() - t0, 3)
    wm_us = _wm_micros(q.lastProgress.prettyJson if hasattr(q.lastProgress, "prettyJson") else json.dumps(q.lastProgress))
    n_batches = len(q.recentProgress)

    sunk = spark.read.parquet(out)
    cols = ["user_id", "start_us", "end_us", "n_events"]

    def sig(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*cols)).alias("h"),
        ).first()
        return int(r["n"]), int(r["h"] or 0)

    file_n, file_h = sig(sunk.select(*cols))

    # batch oracle: gap sessions with streaming end semantics
    events = spark.read.parquet(src)
    batch = sessionize_batch(events).select(
        "user_id",
        "start_us",
        (F.col("end_us") + F.lit(GAP_US)).alias("end_us"),
        "n_events",
    )
    batch_total = batch.count()
    # append emits once the watermark passes the session end; determine
    # the boundary (< vs <=) empirically and record which matched
    closed_lt = batch.where(F.col("end_us") < wm_us)
    n_lt, h_lt = sig(closed_lt)
    agree_lt = (file_n, file_h) == (n_lt, h_lt)
    n_le = h_le = None
    agree_le = False
    if not agree_lt:
        closed_le = batch.where(F.col("end_us") <= wm_us)
        n_le, h_le = sig(closed_le)
        agree_le = (file_n, file_h) == (n_le, h_le)

    # restart on the same checkpoint, unchanged input: exactly-once means
    # zero new rows
    q2 = build_query().start()
    if not q2.awaitTermination(600):
        q2.stop()
        raise RuntimeError("restart did not terminate in 600s")
    file_n2, file_h2 = sig(spark.read.parquet(out).select(*cols))
    idempotent = (file_n2, file_h2) == (file_n, file_h)

    block = {
        "sf_dir": sf_dir,
        "events": events.count(),
        "micro_batches": n_batches,
        "stream_sec": stream_sec,
        "watermark_us": wm_us,
        "file_sink_sessions": file_n,
        "batch_sessions_total": batch_total,
        "batch_sessions_closed": n_lt if agree_lt else n_le,
        "boundary": "end < wm" if agree_lt else ("end <= wm" if agree_le else "NO MATCH"),
        "restart_idempotent": idempotent,
        "agree": (agree_lt or agree_le) and idempotent,
    }
    rung_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SF10_RUNG.json"
    )
    if not SF_DIR:  # only the real SF10 run writes the rung artifact
        try:
            with open(rung_path) as f:
                rung = json.load(f)
        except OSError:
            rung = {}
        rung["streaming_sessions_file_sink"] = block
        with open(rung_path, "w") as f:
            json.dump(rung, f, indent=1)
    print(json.dumps({"metric": "file_sink_rung", **block}))


if __name__ == "__main__":
    main()
