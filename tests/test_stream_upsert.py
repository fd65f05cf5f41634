"""Streaming upsert: later micro-batches must overwrite earlier rows with
the same key, and last-write-wins must hold within a batch."""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from window_aggregation_spark.streaming.upsert import (
    latest_per_key,
    stream_upsert_parquet,
)

SCHEMA = "key long, version long, payload string"


def test_latest_per_key_within_batch(spark):
    df = spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"), (2, 1, "x")], SCHEMA
    )
    out = {r["key"]: r["payload"] for r in latest_per_key(df, ["key"], "version").collect()}
    assert out == {1: "c", 2: "x"}


def test_stream_upsert_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "snapshot")
    checkpoint = str(tmp_path / "ckpt")

    # batch 1: keys 1..3 at version 1; batch 2: keys 2..4 at version 2
    b1 = pd.DataFrame({"key": [1, 2, 3], "version": [1, 1, 1],
                       "payload": ["a1", "b1", "c1"]})
    b2 = pd.DataFrame({"key": [2, 3, 4], "version": [2, 2, 2],
                       "payload": ["b2", "c2", "d2"]})
    for i, b in enumerate([b1, b2]):
        p = src / f"part-{i}.parquet"
        b.to_parquet(p, index=False)
        mtime = time.time() - 60 + i * 10
        os.utime(p, (mtime, mtime))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_upsert_parquet(
        stream, target, keys=["key"], version_col="version", checkpoint=checkpoint
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    snap = {
        r["key"]: (r["version"], r["payload"])
        for r in spark.read.parquet(target).collect()
    }
    assert snap == {
        1: (1, "a1"),   # untouched by batch 2
        2: (2, "b2"),   # upserted
        3: (2, "c2"),   # upserted
        4: (2, "d2"),   # inserted
    }
