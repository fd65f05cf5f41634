"""Streaming windowed aggregation: the streaming plan over the fixture
parquet must equal the batch plan (same logic, memory sink, synchronous
processAllAvailable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.sources.io import read_table
from window_aggregation_spark.streaming.window_stream import (
    sessionize,
    stream_tumbling_counts,
    tumbling_counts,
)

EVENTS_FILE_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    """File-stream sources need a directory of files — stage events.parquet
    alone (sf_dir holds all ten tables with different schemas)."""
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_tumbling_equals_batch(spark, sf_dir, events_dir):
    batch = tumbling_counts(read_table(spark, sf_dir, "events"))
    stream = stream_tumbling_counts(
        spark, events_dir, EVENTS_FILE_SCHEMA, window_duration="1 hour"
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("stream_out").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want


def test_streaming_sessionize_smoke(spark, events_dir):
    """session_window streaming path produces sessions with bounded state."""
    stream = (
        spark.readStream.schema(EVENTS_FILE_SCHEMA)
        .parquet(events_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    sessions = sessionize(stream, gap="30 minutes")
    assert sessions.isStreaming
    q = (
        sessions.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("sess_out").collect()
    assert rows
    assert {"session_start", "user_id", "n_events"} <= set(rows[0].asDict())


def test_batch_sessionize_gap_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00"),
            (2, 100, "2024-01-01 00:10:00"),
            (3, 100, "2024-01-01 01:10:00"),  # > 30 min gap -> new session
            (4, 200, "2024-01-01 00:00:00"),
        ],
        "event_id long, user_id long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap="30 minutes").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}
