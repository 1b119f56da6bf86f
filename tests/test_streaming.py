"""Structured Streaming behavior: the streaming forms must reproduce their
batch twins on the same data (availableNow over the events parquet)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from conecta_spark.queries import epoch_micros
from conecta_spark.streaming.events import (
    hourly_rollup,
    read_event_stream,
    sessionize_batch,
    streaming_hourly_rollup,
    streaming_sessionize,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from conecta_spark.sources.parquet import load_parquet

    return load_parquet(spark, f"{sf_dir}/events.parquet").cache()


def _run_stream(spark, sdf, name: str, timeout: int = 120):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return spark.table(name)


def test_stream_source_reads_events(spark, sf_dir, events):
    sdf = read_event_stream(spark, sf_dir)
    assert sdf.isStreaming
    out = _run_stream(spark, sdf.select("event_id", "ts", "user_id"), "raw_events")
    assert out.count() == events.count()
    # nanos were truncated to micros identically to the batch reader
    b = events.select(F.max("ts")).collect()[0][0]
    s = out.select(F.max("ts")).collect()[0][0]
    assert b == s


def test_streaming_hourly_rollup_matches_batch(spark, sf_dir):
    # Windowed agg in append mode only emits watermark-closed windows; with
    # availableNow the final window would stay open, so compare in complete
    # mode where every window is emitted.
    sdf = streaming_hourly_rollup(read_event_stream(spark, sf_dir))
    q = (
        sdf.writeStream.format("memory")
        .queryName("hourly_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("hourly_complete")
    want = hourly_rollup(_batch_events(spark, sf_dir))
    gs = {(r.hour_start, r.event_type, r.c, r.v) for r in got.collect()}
    ws = {(r.hour_start, r.event_type, r.c, r.v) for r in want.collect()}
    assert gs == ws


def _batch_events(spark, sf_dir):
    from conecta_spark.sources.parquet import load_parquet

    return load_parquet(spark, f"{sf_dir}/events.parquet")


def test_streaming_sessionize_matches_batch(spark, sf_dir, events):
    sdf = streaming_sessionize(read_event_stream(spark, sf_dir))
    got = _run_stream(spark, sdf, "sessions_stream", timeout=180)
    # availableNow + event-time timeout: all sessions close once the
    # watermark passes end-of-input... except sessions still open at the
    # final watermark, which stay in state. Compare against batch sessions
    # that END before (max_ts - gap - watermark) to be safe, keyed by
    # (user_id, start_us).
    batch = sessionize_batch(events)
    max_ts = events.agg(F.max(epoch_micros(events))).collect()[0][0]
    horizon = max_ts - 1_800_000_000 - 3_600_000_000
    closed_batch = {
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in batch.where(F.col("end_us") < horizon).collect()
    }
    got_set = {
        (r.user_id, r.start_us, r.end_us, r.n_events) for r in got.collect()
    }
    missing = closed_batch - got_set
    assert not missing, f"{len(missing)} closed sessions missing from stream"
    # and everything the stream emitted must be a genuine batch session
    all_batch = {
        (r.user_id, r.start_us, r.end_us, r.n_events) for r in batch.collect()
    }
    bogus = got_set - all_batch
    assert not bogus, f"stream emitted {len(bogus)} sessions not in batch"


def test_streaming_dedup_drops_replays(spark, sf_dir, events):
    """The same file delivered twice (replay) must come out once."""
    import hashlib
    import os

    from conecta_spark.streaming.events import streaming_dedup

    src_file = os.path.join(sf_dir, "events.parquet")
    stage = os.path.join(
        "/tmp/conecta_spark_stream",
        "dup-" + hashlib.md5(src_file.encode()).hexdigest()[:12],
    )
    os.makedirs(stage, exist_ok=True)
    for name in ("events-000.parquet", "events-001.parquet"):
        link = os.path.join(stage, name)
        if not os.path.exists(link):
            os.symlink(src_file, link)
    from conecta_spark.streaming.events import normalize_event_ts

    disk_schema = spark.read.parquet(src_file).schema
    sdf = normalize_event_ts(
        spark.readStream.schema(disk_schema).format("parquet").load(stage),
        disk_schema["ts"].dataType,
    )
    deduped = streaming_dedup(sdf, keys=["event_id"])
    out = _run_stream(spark, deduped.select("event_id"), "dedup_replay")
    n = events.count()
    assert spark.table("dedup_replay").count() == n


def test_streaming_interval_join_matches_batch(spark, sf_dir, events):
    """Stream-stream self-join equals the batch interval join (x23) as a
    pair set: availableNow delivers everything before the watermark can
    drop rows, so parity is exact."""
    from conecta_spark.queries import REGISTRY, _load_extensions
    from conecta_spark.streaming.events import streaming_interval_pairs

    _load_extensions()

    sdf = streaming_interval_pairs(read_event_stream(spark, sf_dir))
    got = _run_stream(spark, sdf, "interval_stream")
    got_set = {(r.user_id, r.p_ts, r.a_ts) for r in got.collect()}
    batch = REGISTRY["x23_interval_join"].fn(spark, sf_dir)
    batch_set = {(r.user_id, r.p_ts, r.a_ts) for r in batch.collect()}
    assert got_set == batch_set


def test_checkpointed_file_sink_is_exactly_once(spark, sf_dir, events, tmp_path_factory):
    """Durable sink semantics: a parquet sink driven by a checkpoint must
    not re-emit rows when the same stream is restarted over unchanged
    input -- the recovery property a production pipeline relies on."""
    base = tmp_path_factory.mktemp("stream_sink")
    out, ckpt = str(base / "out"), str(base / "ckpt")

    def run_once():
        sdf = read_event_stream(spark, sf_dir).select("event_id", "user_id")
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == events.count()
    run_once()  # restart over the same input: checkpoint says all consumed
    assert spark.read.parquet(out).count() == n_first


def test_stream_static_enrichment_matches_batch_and_is_stateless(
    spark, sf_dir, events
):
    """Stream-static join: every event enriched with the static profile
    dim, exact batch parity, and NO streaming state (the property that
    distinguishes it from a stream-stream join)."""
    from conecta_spark.streaming.events import (
        read_event_stream,
        streaming_enrich,
        user_profile_dim,
    )

    dim = user_profile_dim(events)
    sdf = streaming_enrich(
        read_event_stream(spark, sf_dir).select("event_id", "user_id"), dim
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # stateless: no state store operators registered for the query
    assert all(
        not p["stateOperators"] for p in q.recentProgress
    ), q.recentProgress
    out = spark.table("enriched")
    batch = streaming_enrich(events.select("event_id", "user_id"), dim)
    assert out.count() == events.count()  # left join: nothing dropped
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b
