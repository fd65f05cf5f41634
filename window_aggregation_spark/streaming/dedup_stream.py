"""Streaming deduplication bounded by a watermark.

A plain ``dropDuplicates`` on a stream keeps every key it has ever seen in
state forever — unbounded growth, the classic way a streaming job dies
after a week. ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint
only until the event-time watermark passes ``event_ts + delay``, so state
is O(keys arriving within one watermark horizon) — the only shape that
survives an unbounded ingest stream at scale.

Semantics (pinned by ``tests/test_stream_dedup.py``):

- the first-arriving record per key is emitted; any duplicate of that key
  arriving while its state is live (within the watermark horizon) is
  dropped, regardless of the duplicate's own timestamp;
- once the watermark passes ``first_ts + delay`` the key's state is
  evicted, and a later record with the same key is emitted AGAIN — the
  documented trade: exactness within the horizon, bounded state beyond it.

The reference engine has no streaming surface; this is extension scope
(SURVEY §2.5) — the streaming twin of the batch ``exact_dedup``
(``operators/dedup.py``), completing the batch/stream pair the same way
``streaming/window_stream.py`` twins the windowed aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def streaming_dedup(
    events: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate ``keys`` from a stream, keeping state only within the
    ``delay`` watermark horizon. ``events`` must be a streaming DataFrame
    with an event-time column ``ts_col``."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def batch_dedup_first(
    df: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "ts",
    tiebreak: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Batch twin of :func:`streaming_dedup` with a DETERMINISTIC
    representative: the event-time-first row per key (``ts_col`` then
    ``tiebreak``, ascending). Matches the stream exactly whenever arrival
    order equals event-time order — which is true of any replayed/ordered
    source — and is the oracle-able formulation either way."""
    order = [F.col(ts_col).asc(), *(F.col(t).asc() for t in tiebreak)]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
