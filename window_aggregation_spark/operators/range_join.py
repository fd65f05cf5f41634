"""Range (interval) join: match point rows to interval rows they fall in.

Extension scope (SURVEY §2.5) — the reference engine has no join operators
at all; this is the time-interval join a training-data/event pipeline needs
(events ↔ incident windows, impressions ↔ campaign flights, log lines ↔
deploy windows).

Why not just ``points.join(ivals, point_ts BETWEEN start AND end)``: a join
whose only condition is an inequality has no equi-key, so Spark plans a
BroadcastNestedLoopJoin (or a cartesian product) — O(|points| · |ivals|)
comparisons. Fine for a handful of intervals, fatal at 100 TB.

The scale shape here is the standard *bucketing* decomposition:

1. pick a bucket width ``W`` (ideally ≥ the typical interval length);
2. explode each interval to every bucket it overlaps — expansion factor is
   ``1 + len/W``, bounded and chosen by the caller;
3. each point belongs to exactly ONE bucket, so a plain equi-join on
   ``(bucket [, keys])`` finds every candidate pair exactly once — no
   post-join dedup is needed (the interval copy in the point's bucket is
   the only copy that can match);
4. the exact containment predicate filters candidates.

One hash shuffle per side on the bucket key; everything stays in
whole-stage codegen. With an additional equi-key (``keys=["user_id"]``)
the shuffle key is ``(key, bucket)``, which also breaks up hot buckets.

Open intervals, NULL bounds and zero-length intervals are the caller's
contract: containment is ``start <= ts AND ts < end`` (half-open, the
standard event-time convention — adjacent intervals tile without double
counting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_of(ts_micros, width_micros: int):
    return F.floor(ts_micros / F.lit(width_micros)).cast("long")


def _micros(col):
    # unix_micros requires TIMESTAMP; parquet micros arrive as
    # TIMESTAMP_NTZ under a default session — cast is a no-op on LTZ and
    # interprets NTZ in the session zone, which cancels out because BOTH
    # sides of the join are bucketed/compared in the same frame.
    return F.unix_micros(col.cast("timestamp"))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    *,
    keys: list[str] | None = None,
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose half-open
    window ``[start, end)`` contains its timestamp (plus equality on
    ``keys`` if given).

    ``how`` is ``inner`` or ``left`` (left keeps pointless points with
    NULL interval columns).

    Both modes are ONE bucketed join: the equi part ``(bucket [, keys])``
    drives the shuffle/hash strategy and the exact containment predicate
    rides along as the residual join condition — for LEFT joins Spark
    applies residual conditions *as part of the join*, so a point whose
    bucket has interval copies but none containing it still surfaces
    exactly once with NULL interval columns. Because each point belongs
    to exactly ONE bucket, no anti-join recovery pass (and no per-row id)
    is needed — an earlier two-pass formulation recomputed the match for
    the anti side, doubling scans.

    Column-name collisions between the two inputs (other than ``keys``)
    must be resolved by the caller before the join — standard Spark rules.

    Output column ORDER is ``points.columns`` then the non-key
    ``intervals`` columns. (Changed in the r4 single-pass rewrite: the
    old ``on=[bucket, *keys]`` join hoisted key columns first. Name-based
    access is unaffected; positional consumers should re-select.)
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r} (inner/left)")
    keys = list(keys or [])
    width = _parse_bucket_micros(bucket)

    p_ts = _micros(F.col(point_ts))
    s_ts = _micros(F.col(start_col))
    e_ts = _micros(F.col(end_col))

    pts = points.withColumn("__bkt", _bucket_of(p_ts, width)).alias("__rj_p")
    # explode intervals to the buckets they overlap: floor(start/W) ..
    # floor((end - 1µs)/W) — half-open, so an interval ending exactly on a
    # bucket boundary does NOT enter the next bucket.
    first_b = _bucket_of(s_ts, width)
    last_b = _bucket_of(e_ts - F.lit(1), width)
    ivals = (
        intervals.where(F.col(start_col) < F.col(end_col))
        .withColumn(
            "__bkt", F.explode(F.sequence(first_b, F.greatest(first_b, last_b)))
        )
        .alias("__rj_i")
    )

    cond = F.col("__rj_p.__bkt") == F.col("__rj_i.__bkt")
    for k in keys:
        cond = cond & (F.col(f"__rj_p.{k}") == F.col(f"__rj_i.{k}"))
    cond = (
        cond
        & (F.col(f"__rj_i.{start_col}") <= F.col(f"__rj_p.{point_ts}"))
        & (F.col(f"__rj_p.{point_ts}") < F.col(f"__rj_i.{end_col}"))
    )
    joined = pts.join(ivals, cond, "inner" if how == "inner" else "leftOuter")
    # keys come from the preserved point side; intervals contribute the rest
    return joined.select(
        *[F.col(f"__rj_p.{c}") for c in points.columns],
        *[
            F.col(f"__rj_i.{c}")
            for c in intervals.columns
            if c not in keys
        ],
    )


def _parse_bucket_micros(bucket: str) -> int:
    amount, unit = bucket.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return int(amount) * mult * 1_000_000
