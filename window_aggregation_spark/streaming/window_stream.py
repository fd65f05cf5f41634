"""Streaming windowed aggregation over event streams.

The reference is batch-only (SURVEY §2.5) — this module is extension scope:
the same windowed-aggregation semantics on an unbounded stream via
Structured Streaming.

- :func:`tumbling_counts` — the shared *logic*: time-bucketed (tumbling
  window) per-key aggregates, expressed once and applied to either a batch
  or a streaming DataFrame. On a stream, pair it with a watermark so state
  for closed windows is evicted (bounded state at 100 TB/day rates).
- :func:`stream_tumbling_counts` — the streaming wrapper: file-source
  ``readStream`` -> watermark -> window agg. Tested by running the fixture
  parquet through a memory sink and asserting equality with the batch run
  (streaming and batch share one logical plan, so this is a real
  end-to-end check, not a toy).
- :func:`sessionize` — gap-based sessionization as a batch window
  composition (lag + gap flag + running sum), the classic pattern; its
  streaming twin is ``F.session_window`` which we use when a stream handle
  is given.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# one duration grammar for batch and streaming sessionization — the
# local copy this replaced lacked day units and had already drifted
from window_aggregation_spark.operators.timeseries import _parse_gap_seconds


def tumbling_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    slide: str | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(window, key) count + sum. Works on batch and streaming frames;
    pass ``watermark`` on streams to bound state; pass ``slide`` for
    overlapping (sliding) windows — each event then lands in
    duration/slide windows."""
    df = events
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    return (
        df.groupBy(win.alias("win"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def stream_tumbling_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    *,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming variant reading a parquet directory as a file stream."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    if dict(stream.dtypes).get(ts_col) == "bigint":  # nanos fixture layout
        stream = stream.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    return tumbling_counts(
        stream, window_duration=window_duration, watermark=watermark, ts_col=ts_col
    )


def sessionize(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Assign a session id per user: a new session starts when the gap from
    the previous event exceeds ``gap``.

    Batch implementation is the window composition lag -> gap flag ->
    running sum (two window passes over one shuffle on ``user_col``); on a
    streaming DataFrame use ``F.session_window`` instead.
    """
    if events.isStreaming:
        return (
            events.withWatermark(ts_col, gap)
            .groupBy(F.session_window(ts_col, gap).alias("sess"), user_col)
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("sess.start").alias("session_start"), user_col, "n_events"
            )
        )
    gap_seconds = _parse_gap_seconds(gap)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    # unix_micros requires TIMESTAMP; parquet TIMESTAMP(MICROS isAdjustedToUTC
    # =false) arrives as TIMESTAMP_NTZ under a default session, so cast (a
    # no-op on LTZ). The cast interprets NTZ in the session zone — harmless
    # here because only *differences* feed the gap test, and a constant zone
    # offset cancels.
    ts_ltz = F.col(ts_col).cast("timestamp")
    prev_ts = F.lag(ts_ltz).over(w)
    # gap must be measured at full timestamp precision: unix_timestamp()
    # truncates to seconds, which mis-classifies gaps whose sub-second
    # fractions straddle a second boundary (and diverges from both
    # session_window and a fractional-epoch SQL oracle)
    gap_micros = F.unix_micros(ts_ltz) - F.unix_micros(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_micros > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(w).cast("int")
    ).drop("__new")


