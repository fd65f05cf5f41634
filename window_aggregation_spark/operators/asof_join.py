"""As-of join: for each left row, the most recent right row at or before it.

Spark has no native as-of join (pandas has ``merge_asof``; several SQL
engines have ``ASOF JOIN``). The scalable implementation here is the
union-and-window composition:

1. union left and right with aligned schemas and a side tag,
2. one window partitioned by the equi-keys, ordered by
   ``(ts, side, tiebreak)`` with right rows sorting BEFORE left rows at
   equal timestamps (as-of uses <=),
3. ``last(right_payload, ignorenulls=True)`` over the running frame carries
   the latest right values forward,
4. keep left rows.

Cost: ONE shuffle on the keys + one sort — the same plan shape as a window
aggregation, with no join explosion and no per-group materialization. This
beats the bucketize-and-equi-join approximation (which needs a second pass
for bucket-boundary misses) and the per-group ``merge_asof`` pandas path
(Python in the hot loop) at any scale where the right side doesn't fit in a
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For every ``left`` row, append ``right_cols`` from the matching
    ``right`` row with the same ``on`` keys (null when no such row exists):
    the latest with ``right.ts <= left.ts`` (``direction="backward"``, the
    default) or the earliest with ``right.ts >= left.ts``
    (``direction="forward"`` — pandas ``merge_asof`` naming). Forward is
    the same one-shuffle union+window plan with the time order reversed.
    ``direction="nearest"`` picks whichever of the two is closer in time
    (equidistant ties go to the backward match); both carried windows
    share the one exchange — the second differs only in sort order, so
    the plan is one shuffle + two in-partition sorts, still no join.

    ``tiebreak``: a right-side column making right's ordering total (ties
    on ``ts_col`` would otherwise be nondeterministic); the largest
    tiebreak value wins in both directions.

    ``tolerance`` (e.g. ``"7 days"``): maximum staleness — a match further
    than this from ``left.ts`` is nulled out, exactly like no match. The
    matched row's timestamp rides inside the carried payload struct, so
    the filter is a pure projection on top of the same plan: still one
    shuffle, no second pass.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be 'backward', 'forward' or "
            f"'nearest', got {direction!r}"
        )
    overlap = [c for c in right_cols if c in left.columns]
    out_names = {c: (c + suffix if c in overlap else c) for c in right_cols}

    # the right payload rides as ONE struct so the carried columns always
    # come from the same right row (independent last(col) calls could mix
    # rows when some payload columns are null); the right row's own ts
    # ("__rts") is carried too, which is what makes tolerance a free
    # projection instead of a second window
    ts_type = dict(right.dtypes)[ts_col]
    payload_type = ", ".join(
        [f"__rts: {ts_type}"]
        + [f"{c}: {dict(right.dtypes)[c]}" for c in right_cols]
    )
    # the tiebreak keeps its native type: casting to long would null out
    # string/timestamp tiebreaks and silently reintroduce nondeterminism
    tb_type = dict(right.dtypes)[tiebreak] if tiebreak else "int"
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        F.lit(None).cast(f"struct<{payload_type}>").alias("__r"),
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (*on, ts_col) else F.lit(None).cast(t).alias(c)
            for c, t in left.dtypes
        ],
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast(tb_type).alias("__tb"),
        F.struct(
            F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # backward scans past->future and carries the last right row seen
    # (latest <= left.ts); forward scans future->past, so the last right
    # row seen is the EARLIEST >= left.ts. Right sorts before left at
    # equal ts in both cases — as-of bounds are inclusive.
    def carried_over(dir_: str):
        order_ts = (
            F.col(ts_col).asc() if dir_ == "backward" else F.col(ts_col).desc()
        )
        w = Window.partitionBy(*on).orderBy(
            order_ts, F.col("__side").asc(), F.col("__tb").asc()
        )
        return F.last("__r", ignorenulls=True).over(w)

    if direction == "nearest":
        # both windows share the one hash exchange (same partition keys);
        # the second pays only an in-partition re-sort, never a shuffle
        carried = unioned.select(
            "*",
            carried_over("backward").alias("__mb"),
            carried_over("forward").alias("__mf"),
        )
        dist_b = F.col(ts_col) - F.col("__mb.__rts")
        dist_f = F.col("__mf.__rts") - F.col(ts_col)
        ok_b = F.col("__mb.__rts").isNotNull()
        ok_f = F.col("__mf.__rts").isNotNull()
        if tolerance is not None:
            tol = F.expr(f"INTERVAL {tolerance}")
            ok_b = ok_b & (dist_b <= tol)
            ok_f = ok_f & (dist_f <= tol)
        use_b = ok_b & (~ok_f | (dist_b <= dist_f))
        picked = [
            F.when(use_b, F.col(f"__mb.{c}"))
            .when(ok_f, F.col(f"__mf.{c}"))
            .alias(out_names[c])
            for c in right_cols
        ]
        return carried.where(F.col("__side") == 1).select(
            *[F.col(c) for c in left.columns], *picked
        )

    carried = unioned.select("*", carried_over(direction).alias("__m"))
    if tolerance is None:
        picked = [
            F.col(f"__m.{c}").alias(out_names[c]) for c in right_cols
        ]
    else:
        staleness = (
            F.col(ts_col) - F.col("__m.__rts")
            if direction == "backward"
            else F.col("__m.__rts") - F.col(ts_col)
        )
        ok = F.col("__m.__rts").isNotNull() & (
            staleness <= F.expr(f"INTERVAL {tolerance}")
        )
        picked = [
            F.when(ok, F.col(f"__m.{c}")).alias(out_names[c])
            for c in right_cols
        ]
    return carried.where(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns], *picked
    )
