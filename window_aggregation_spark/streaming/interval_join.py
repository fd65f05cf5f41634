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

``how="left"`` adds left-outer semantics: unmatched left rows are emitted
with NULL right columns. On streams this is Spark's watermark-correct
outer join — an unmatched left row is only emitted once the watermark
passes ``left_ts`` (plus the join bound), i.e. once no future right row
could still match it; before the round-3 addition those rows were dropped
silently. A terminating stream therefore holds back rows the watermark
never passed. For finite backfills, :func:`flush_sentinel` builds the
far-future event that drains those held-back tail rows and
:func:`is_flush_sentinel` is the matching sink-side filter — the drain
recipe lives HERE, not in each caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default event time for drain sentinels — far enough in the future that
#: the min-over-sides global watermark passes every real row's eviction
#: bound once one sentinel per side has been consumed.
SENTINEL_TS = "2100-01-01 00:00:00"


def flush_sentinel(
    template: DataFrame,
    ts_col: str,
    *,
    at: str = SENTINEL_TS,
    overrides: dict | None = None,
    keys: tuple = (),
) -> DataFrame:
    """One far-future row shaped like ``template`` — the watermark-drain
    sentinel for finite streams feeding an outer stream-stream join (or
    any watermark-gated stateful op).

    Spark's global watermark is the minimum over BOTH sides' watermark
    nodes, and outer-join / late-data state is only flushed when that
    watermark passes it — so a stream that simply *ends* holds its tail
    rows back forever. Appending one sentinel per side as the LAST input
    (for a file source: a separate file with the latest modification
    time — FileStreamSource orders files by mtime) advances the
    watermark past every real row and drains the held-back tail.

    ``ts_col`` gets ``at`` (cast to the template's type, so
    TIMESTAMP_NTZ templates work); columns named in ``overrides`` get
    that literal; every other column is NULL.

    Pass the join's equi-keys as ``keys``, and give EVERY key a non-NULL
    value (in ``overrides``) that no real row uses — e.g. a negative id.
    NULL keys do NOT work, and not for the obvious reason: Catalyst
    derives an ``isnotnull(key)`` constraint from the equi-join
    condition for every side the join does not preserve and pushes it
    into that side's SCAN, so a NULL-keyed sentinel dies before its
    watermark node ever sees it and the global watermark (the min over
    sides) never advances — measured: the right-side sentinel of a LEFT
    join vanishes at the scan and every tail row stays held back. The
    helper raises on NULL keys rather than let that failure ship.

    Under a LEFT join the left-side sentinel itself IS emitted (as an
    unmatched row once the watermark passes it) — filter the SINK with
    :func:`is_flush_sentinel`. DO NOT filter sentinels in the streaming
    plan: a predicate on an outer-join streaming plan is pushed down
    through the join into both source scans, so the sentinels die
    BEFORE the watermark nodes and the tail rows they exist to flush
    are never emitted (the sink table is the only safe place — see
    tests/test_interval_join.py).
    """
    overrides = dict(overrides or {})
    if ts_col in overrides:
        raise ValueError(
            f"flush_sentinel: pass the sentinel timestamp via at=, not "
            f"overrides[{ts_col!r}] (the ts column is what the sentinel "
            "exists to set)"
        )
    null_keys = [k for k in keys if overrides.get(k) is None]
    if null_keys:
        raise ValueError(
            f"flush_sentinel: join keys {sorted(null_keys)} need non-NULL "
            "never-matching override values — Catalyst pushes an "
            "isnotnull(key) constraint into the non-preserved side's scan, "
            "so a NULL-keyed sentinel never reaches its watermark node"
        )
    cols = []
    for c, t in template.dtypes:
        if c == ts_col:
            cols.append(F.to_timestamp(F.lit(at)).cast(t).alias(c))
        elif c in overrides:
            cols.append(F.lit(overrides.pop(c)).cast(t).alias(c))
        else:
            cols.append(F.lit(None).cast(t).alias(c))
    if overrides:
        raise ValueError(
            f"flush_sentinel: override columns not in template: "
            f"{sorted(overrides)}"
        )
    return template.sparkSession.range(1).select(*cols)


def is_flush_sentinel(ts_col: str, *, at: str = SENTINEL_TS) -> Column:
    """Sink-side predicate matching rows :func:`flush_sentinel` produced
    (by their sentinel event time). Apply ``~is_flush_sentinel(...)`` to
    the SINK TABLE after the stream completes — never to the streaming
    plan itself (see the pushdown warning on :func:`flush_sentinel`)."""
    return F.col(ts_col).cast("timestamp") == F.to_timestamp(F.lit(at))


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
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` rows with the same ``keys``
    whose timestamps satisfy
    ``right_ts + lower <= left_ts < right_ts + upper`` (half-open, so
    ``lower="0 seconds"`` includes simultaneous events exactly once).
    ``how`` is ``inner`` or ``left`` (left keeps unmatched left rows with
    NULL right columns; on streams they are emitted when the watermark
    proves no match can still arrive).

    ``left_ts`` / ``right_ts`` must already be distinct column names
    (rename before calling — same contract as :func:`.range_join`); all
    non-key, non-ts collisions are the caller's to resolve too.

    Works on two batch frames or two streaming frames. Streaming inputs
    get ``watermark`` applied to BOTH time columns; together with the time
    bound in the join condition this lets Spark GC join state — rows older
    than ``watermark + upper`` can never match again and are evicted.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: unsupported how={how!r} (inner/left)")
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
    # Explicit plan aliases: when both sides derive from the same source
    # (the common self-join shape), `left[k] == right[k]` can resolve to
    # the SAME attribute — and `drop(right[k])` then removes the left copy,
    # which under leftOuter surfaces the right side's NULL key instead of
    # the preserved left value.
    lhs, rhs = left.alias("__ij_l"), right.alias("__ij_r")
    cond = None
    for k in keys:
        eq = F.col(f"__ij_l.{k}") == F.col(f"__ij_r.{k}")
        cond = eq if cond is None else cond & eq
    lo = F.col(f"__ij_r.{right_ts}") + F.expr(f"INTERVAL {lower}")
    hi = F.col(f"__ij_r.{right_ts}") + F.expr(f"INTERVAL {upper}")
    lts = F.col(f"__ij_l.{left_ts}")
    cond = cond & (lts >= lo) & (lts < hi)
    joined = lhs.join(rhs, cond, "inner" if how == "inner" else "leftOuter")
    # keys come from the preserved left side; right contributes the rest
    return joined.select(
        *[F.col(f"__ij_l.{c}") for c in left.columns],
        *[F.col(f"__ij_r.{c}") for c in right.columns if c not in keys],
    )
