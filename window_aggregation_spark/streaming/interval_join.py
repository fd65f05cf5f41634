"""Stream-stream interval join: left events matched to right events of the
same key within a bounded event-time window.

Extension scope (SURVEY §2.5). The batch shape is an equi-join on ``keys``
plus a time-range filter — Catalyst plans a shuffled hash / sort-merge
join on the key, and the range predicate prunes post-join (the key
equality is the selective part; the time bound is cheap codegen).

On STREAMING inputs this is Spark's canonical stream-stream join: both
sides get event-time watermarks, and the join condition carries the time
bound so the state store can evict rows once the watermark passes
``upper`` — bounded state, the property that keeps an unbounded join alive
at 100 TB/day. Without the time bound Spark would have to keep all past
rows of both streams forever.

Inner joins in append mode emit exactly the matched pairs, so the
streaming result equals the batch join on the same data — pinned by
``tests/test_interval_join.py`` running the fixture through a file stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    *,
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join ``left`` rows to ``right`` rows with the same ``keys``
    whose timestamps satisfy
    ``right_ts + lower <= left_ts < right_ts + upper`` (half-open, so
    ``lower="0 seconds"`` includes simultaneous events exactly once).

    ``left_ts`` / ``right_ts`` must already be distinct column names
    (rename before calling — same contract as :func:`.range_join`); all
    non-key, non-ts collisions are the caller's to resolve too.

    Works on two batch frames or two streaming frames. Streaming inputs
    get ``watermark`` applied to BOTH time columns; together with the time
    bound in the join condition this lets Spark GC join state — rows older
    than ``watermark + upper`` can never match again and are evicted.
    """
    if left.isStreaming != right.isStreaming:
        raise ValueError("interval_join requires both sides batch or both streaming")
    if not keys:
        # a pure time-range condition has no equi-key, so Spark would plan
        # a nested-loop join (batch) or unbounded-state join (stream) —
        # the keyless point-in-interval shape belongs to the bucketed
        # operators.range_join decomposition instead
        raise ValueError(
            "interval_join needs at least one equi-key; for keyless "
            "point-in-interval matching use operators.range_join"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    cond = None
    for k in keys:
        eq = left[k] == right[k]
        cond = eq if cond is None else cond & eq
    lo = F.col(right_ts) + F.expr(f"INTERVAL {lower}")
    hi = F.col(right_ts) + F.expr(f"INTERVAL {upper}")
    time_cond = (F.col(left_ts) >= lo) & (F.col(left_ts) < hi)
    cond = time_cond if cond is None else cond & time_cond
    joined = left.join(right, cond, "inner")
    # drop the duplicated key columns from the right side
    for k in keys:
        joined = joined.drop(right[k])
    return joined
