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
    "event_id long, ts timestamp, user_id long, event_type string, "
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


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics: in append mode with a 1-hour watermark, an event
    arriving in a later micro-batch whose window closed before the watermark
    is DROPPED — its window's counts must not include it. This is the
    bounded-state guarantee the 100 TB streaming path relies on (closed
    window state is evicted, so arbitrarily late data cannot resurrect it)."""
    import os
    import time

    import pandas as pd

    src = tmp_path / "late_src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    # batch 1: on-time events at 01:10 and 03:20 -> the watermark advances
    # to 03:20 - 1h = 02:20 at the END of this batch, closing the
    # [00:00, 01:00) and [01:00, 02:00) windows.
    b1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": [base + pd.Timedelta("1h10m"), base + pd.Timedelta("3h20m")],
            "event_type": ["a", "a"],
            "value": [1.0, 1.0],
        }
    )
    # batch 2: an innocuous event in the still-open [03:00] window. Needed
    # because Spark >= 3.4 filters late events with the PREVIOUS batch's
    # watermark (eviction uses the current one) — the 02:20 watermark only
    # gates late data from the second batch after b1 onward.
    b2 = pd.DataFrame(
        {
            "event_id": [3],
            "ts": [base + pd.Timedelta("3h25m")],
            "event_type": ["a"],
            "value": [1.0],
        }
    )
    # batch 3: a late event at 00:30 (window [00:00, 01:00) — closed) and an
    # acceptable one at 03:30
    b3 = pd.DataFrame(
        {
            "event_id": [4, 5],
            "ts": [base + pd.Timedelta("30m"), base + pd.Timedelta("3h30m")],
            "event_type": ["a", "a"],
            "value": [10.0, 1.0],
        }
    )
    for i, b in enumerate([b1, b2, b3]):
        p = src / f"part-{i}.parquet"
        # pandas defaults to TIMESTAMP(NANOS), which Spark has no type for
        b.to_parquet(p, index=False, coerce_timestamps="us")
        mtime = time.time() - 60 + i * 10
        os.utime(p, (mtime, mtime))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = tumbling_counts(stream, window_duration="1 hour", watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in spark.table("late_out").collect()
    }
    # the 01:00 window was emitted with only the on-time event; the late
    # 00:30 event produced no [00:00] window at all
    assert emitted.get(base + pd.Timedelta("1h")) == (1, 1.0)
    assert base not in emitted


def test_streaming_sessionize_smoke(spark, events_dir):
    """session_window streaming path produces sessions with bounded state."""
    stream = spark.readStream.schema(EVENTS_FILE_SCHEMA).parquet(events_dir)
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


def test_corpus_projection_ops_run_unchanged_on_streams(spark, sf_dir, tmp_path):
    """The shuffle-free corpus operators (hash split, stratified sample,
    PII redaction, model-scored quality) are pure projections, so the SAME
    calls run on a streaming DataFrame — declare once, run batch or
    stream. Streaming result must equal the batch run row-for-row."""
    import shutil

    from window_aggregation_spark.operators import corpus as cp
    from window_aggregation_spark.operators import text as tx

    d = tmp_path / "docs_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", d / "documents.parquet")

    def pipeline(df):
        df = cp.split_by_hash(df, "doc_id", {"train": 0.8, "val": 0.2})
        df = cp.stratified_sample(
            df, "source", {}, "doc_id", default_rate=0.5
        )
        df = df.withColumn("clean", cp.redact_pii(F.col("text")))
        df = tx.quality_model_score(df, "clean")
        return df.select("doc_id", "split", "model_score")

    batch = pipeline(read_table(spark, sf_dir, "documents"))
    stream_in = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(str(d))
    out = pipeline(stream_in)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("corpus_stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("corpus_stream_out").collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0
