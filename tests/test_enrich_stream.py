"""Stream-static enrichment: streaming result equals the batch join, a
file-backed dimension is re-read between micro-batches, and the guards
reject the shapes that belong to other operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.sources.io import read_table
from window_aggregation_spark.streaming.enrich import enrich_stream

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    import shutil

    d = tmp_path_factory.mktemp("events_enrich")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _dim(spark):
    return spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("error", -1.0)],
        "event_type string, weight double",
    )


def test_stream_enrichment_equals_batch_join(spark, sf_dir, events_dir):
    batch = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type"
    )
    want = {
        (r["event_id"], r["weight"])
        for r in batch.join(_dim(spark), on="event_type", how="left").collect()
    }

    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(events_dir)
        .select("event_id", "event_type")
    )
    out = enrich_stream(stream, _dim(spark), ["event_type"])
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["event_id"], r["weight"])
        for r in spark.table("enrich_out").collect()
    }
    assert got == want
    # left semantics: event types outside the dim survive with NULL weight
    assert any(w is None for _, w in got)


def test_file_backed_dim_refreshes_between_batches(spark, tmp_path):
    """The static side is re-resolved per micro-batch: replacing the
    dimension file between batches changes later batches' enrichment."""
    import pandas as pd
    import time
    import os

    src = tmp_path / "stream_src"
    dim_dir = tmp_path / "dim"
    src.mkdir()
    dim_dir.mkdir()

    pd.DataFrame({"k": [1], "label": ["v1"]}).to_parquet(dim_dir / "d.parquet")
    dim = spark.read.format("parquet").schema("k long, label string").load(
        str(dim_dir)
    )

    b1 = src / "b1.parquet"
    pd.DataFrame({"event_id": [10], "k": [1]}).to_parquet(b1)
    stream = (
        spark.readStream.schema("event_id long, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = enrich_stream(stream, dim, ["k"])
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("refresh_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # swap the dimension content, then deliver a second micro-batch
        pd.DataFrame({"k": [1], "label": ["v2"]}).to_parquet(
            dim_dir / "d.parquet"
        )
        b2 = src / "b2.parquet"
        pd.DataFrame({"event_id": [20], "k": [1]}).to_parquet(b2)
        mtime = time.time() + 5
        os.utime(b2, (mtime, mtime))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_id"]: r["label"]
        for r in spark.table("refresh_out").collect()
    }
    assert got[10] == "v1"
    assert got[20] == "v2"


def test_enrich_guards(spark, sf_dir, events_dir):
    batch = read_table(spark, sf_dir, "events")
    stream = spark.readStream.schema(SCHEMA).parquet(events_dir)
    with pytest.raises(ValueError, match="streaming"):
        enrich_stream(batch, _dim(spark), ["event_type"])
    with pytest.raises(ValueError, match="interval_join"):
        enrich_stream(stream, stream, ["event_type"])
    with pytest.raises(ValueError, match="how"):
        enrich_stream(stream, _dim(spark), ["event_type"], how="full")
