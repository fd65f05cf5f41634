"""Watermark-bounded streaming dedup: duplicates within the horizon are
dropped across micro-batches; a key whose state the watermark already
evicted is emitted again (bounded-state trade, pinned explicitly)."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from window_aggregation_spark.streaming.dedup_stream import (
    batch_dedup_first,
    streaming_dedup,
)

SCHEMA = "event_id long, user_id long, ts timestamp, value double"
T0 = pd.Timestamp("2024-01-01")


def _ev(eid: int, minutes: float) -> dict:
    return {
        "event_id": eid,
        "user_id": eid % 3,
        "ts": T0 + pd.Timedelta(minutes=minutes),
        "value": float(eid),
    }


@pytest.fixture()
def staged_dup_stream(tmp_path):
    """3 time-ordered files (one micro-batch each, delay='3 minutes'):

    - file1: events 0..9 (ts 0..9 min) + exact duplicate of event 9
      (same-batch duplicate);
    - file2: events 10..19 (ts 10..19) + exact duplicate of event 8
      (cross-batch duplicate; state live — watermark after batch1 is
      9-3=6 min < 8+3=11 min expiry);
    - file3: events 20..29 (ts 20..29) + a RETRANSMISSION of key 0 with a
      fresh ts=21 (key 0's state expired at 0+3=3 min, watermark after
      batch2 is 19-3=16 min -> evicted -> must be emitted again).
    """
    f1 = [_ev(i, i) for i in range(10)] + [_ev(9, 9)]
    f2 = [_ev(i, i) for i in range(10, 20)] + [_ev(8, 8)]
    f3 = [_ev(i, i) for i in range(20, 30)] + [_ev(0, 21)]
    d = tmp_path / "stream"
    d.mkdir()
    for part, rows in enumerate([f1, f2, f3]):
        p = d / f"part-{part}.parquet"
        pd.DataFrame(rows).to_parquet(
            p, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        mtime = time.time() - 300 + part * 10
        os.utime(p, (mtime, mtime))
    return str(d)


def test_streaming_dedup_within_watermark(spark, staged_dup_stream):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dup_stream)
    )
    q = (
        streaming_dedup(stream, ["event_id"], ts_col="ts", delay="3 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        batches = q.recentProgress
    finally:
        q.stop()

    rows = spark.table("dedup_out").collect()
    counts: dict[int, int] = {}
    for r in rows:
        counts[r["event_id"]] = counts.get(r["event_id"], 0) + 1

    # every key surfaced; in-horizon duplicates (8, 9) dropped
    assert set(counts) == set(range(30))
    assert counts[8] == 1 and counts[9] == 1
    # beyond-horizon retransmission of key 0 emitted again: bounded state
    assert counts[0] == 2
    assert len(rows) == 31
    # the duplicates really spanned multiple micro-batches
    assert len([b for b in batches if b["numInputRows"] > 0]) >= 3


def test_streaming_dedup_state_is_bounded(spark, staged_dup_stream):
    """The state store must EVICT expired keys — numRowsTotal after the
    last batch must be well under the 30 distinct keys seen (plain
    dropDuplicates would hold all 30 forever)."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dup_stream)
    )
    q = (
        streaming_dedup(stream, ["event_id"], ts_col="ts", delay="3 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_state")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [p for p in q.recentProgress if p["stateOperators"]]
    finally:
        q.stop()
    last_state = progress[-1]["stateOperators"][0]
    assert last_state["numRowsTotal"] < 30


def test_batch_twin_matches_stream_for_ordered_arrival(spark, staged_dup_stream):
    """Replaying the same files in batch through batch_dedup_first yields
    the stream's within-horizon output exactly (files 1+2: arrival order ==
    event-time order, all duplicates in-horizon)."""
    import glob

    paths = sorted(glob.glob(f"{staged_dup_stream}/part-*.parquet"))[:2]
    df = spark.read.schema(SCHEMA).parquet(*paths)
    out = batch_dedup_first(df, ["event_id"], ts_col="ts")
    got = {(r["event_id"], r["value"]) for r in out.collect()}
    assert got == {(i, float(i)) for i in range(20)}
    assert out.count() == 20


def test_batch_twin_representative_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "k", 5.0, "late"), (0, "k", 5.0, "first"), (2, "k", 4.0, "early")],
        "event_id long, key string, mins double, tag string",
    ).withColumn("ts", F.timestamp_seconds(F.col("mins") * 60))
    out = batch_dedup_first(df, ["key"], ts_col="ts")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["tag"] == "early"
