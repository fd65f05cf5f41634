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
    plan itself (see the pushdown warning on :func:`flush_sentinel`).

    Caveat (ADVICE r9): this matches on event time ALONE, so ``at`` must
    be provably outside the data's time domain — a real row that
    legitimately carries ``ts == at`` would be stripped with the
    sentinels. The default ``SENTINEL_TS`` (year 2100) satisfies that
    for any historical corpus; if your data's domain can reach ``at``,
    use :meth:`IntervalJoinSpec.strip_sentinels`, which additionally
    matches the never-matching sentinel KEY values."""
    return F.col(ts_col).cast("timestamp") == F.to_timestamp(F.lit(at))


# Per-dtype (left, right) sentinel key values — distinct per side so the
# two sides' sentinels can never join EACH OTHER (both carry the same
# far-future ts, which satisfies any [lower, upper) bound that includes
# zero), and chosen at the extreme edge of each type's domain so no real
# row plausibly carries them. They are also what strip_sentinels matches
# on, so even a real row AT the sentinel timestamp survives the strip
# unless it also carries these exact key values.
_SENTINEL_KEY_VALUES: dict = {
    "bigint": (-(2**62) - 17, -(2**62) - 18),
    "int": (-(2**31) + 17, -(2**31) + 18),
    "smallint": (-(2**15) + 17, -(2**15) + 18),
    "tinyint": (-(2**7) + 17, -(2**7) + 18),
    "string": ("\x00__drain_sentinel_left__", "\x00__drain_sentinel_right__"),
    "double": (-1.7976931348623155e308, -1.7976931348623153e308),
    "float": (-3.4028230607370965e38, -3.4028228530382653e38),
}


def _sentinel_key_value(key: str, dtype: str, side: int):
    """The auto-chosen never-matching value for join key ``key`` of
    ``dtype`` on side 0 (left) / 1 (right); raises with the manual
    recipe for types that have no safe extreme value."""
    try:
        return _SENTINEL_KEY_VALUES[dtype][side]
    except KeyError:
        raise ValueError(
            f"drain_sentinels: no auto sentinel value for join key "
            f"{key!r} of type {dtype!r} — build the sentinels manually "
            "with flush_sentinel(overrides={...}) using a value no real "
            "row carries"
        ) from None


class IntervalJoinSpec:
    """The interval join as a SPEC object (VERDICT r9 next-round #5) —
    same parameters as :func:`interval_join`, plus the finite-stream
    drain recipe DERIVED from the spec itself, so composite-key callers
    cannot under-override a key component:

    - :meth:`join` — run the join (identical to :func:`interval_join`).
    - :meth:`drain_sentinels` — one far-future sentinel row per side,
      every join key auto-filled with a per-side never-matching value
      (``_SENTINEL_KEY_VALUES``); append each as the LAST input of its
      side's stream.
    - :meth:`strip_sentinels` — sink-table filter matching sentinel
      rows by timestamp AND the auto-chosen key values, so a real row
      that happens to carry the sentinel timestamp is NOT dropped
      (the ADVICE r9 gap in the ts-only :func:`is_flush_sentinel`).
    """

    def __init__(
        self,
        keys: list[str],
        left_ts: str = "ts",
        right_ts: str = "ts_r",
        *,
        lower: str = "0 seconds",
        upper: str = "15 minutes",
        watermark: str = "2 hours",
        how: str = "inner",
        sentinel_at: str = SENTINEL_TS,
    ):
        if not keys:
            raise ValueError(
                "interval_join needs at least one equi-key; for keyless "
                "point-in-interval matching use operators.range_join"
            )
        self.keys = list(keys)
        self.left_ts = left_ts
        self.right_ts = right_ts
        self.lower = lower
        self.upper = upper
        self.watermark = watermark
        self.how = how
        self.sentinel_at = sentinel_at

    def join(self, left: DataFrame, right: DataFrame) -> DataFrame:
        return interval_join(
            left, right, self.keys, self.left_ts, self.right_ts,
            lower=self.lower, upper=self.upper,
            watermark=self.watermark, how=self.how,
        )

    def _key_overrides(self, template: DataFrame, side: int) -> dict:
        dtypes = dict(template.dtypes)
        missing = [k for k in self.keys if k not in dtypes]
        if missing:
            raise ValueError(
                f"drain_sentinels: join keys {missing} not in the "
                f"side-{'LR'[side]} template columns {template.columns}"
            )
        ts_col = self.left_ts if side == 0 else self.right_ts
        if ts_col not in dtypes:
            # flush_sentinel silently omits a ts column absent from the
            # template, producing a sentinel with no event time that
            # never advances the watermark — the exact silent-drain
            # failure this API exists to prevent (ADVICE r10)
            raise ValueError(
                f"drain_sentinels: side-{'LR'[side]} timestamp column "
                f"{ts_col!r} not in the template columns "
                f"{template.columns} — a sentinel without its event-time "
                "column cannot advance the watermark and the drain "
                "silently never happens"
            )
        return {
            k: _sentinel_key_value(k, dtypes[k], side) for k in self.keys
        }

    def drain_sentinels(
        self,
        left_template: DataFrame,
        right_template: DataFrame,
        *,
        left_overrides: dict | None = None,
        right_overrides: dict | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """Both sides' drain sentinels, shaped like the given templates
        (which must carry the join-side schemas: ``left_ts`` /
        ``right_ts`` respectively). EVERY join key is auto-filled with
        its side's never-matching value — callers may override other
        columns (routing tags, ids) via ``*_overrides`` but NOT the
        keys or the ts column, so a composite-key caller cannot leave
        one component NULL and lose the sentinel to Catalyst's
        ``isnotnull(key)`` scan pushdown (see :func:`flush_sentinel`)."""
        for name, ov in (("left", left_overrides), ("right", right_overrides)):
            clash = set(ov or ()) & set(self.keys)
            if clash:
                raise ValueError(
                    f"drain_sentinels: {name}_overrides must not name join "
                    f"keys {sorted(clash)} — key values are auto-chosen so "
                    "strip_sentinels can match them back out"
                )
        left_sent = flush_sentinel(
            left_template, self.left_ts, at=self.sentinel_at,
            keys=tuple(self.keys),
            overrides={**self._key_overrides(left_template, 0),
                       **(left_overrides or {})},
        )
        right_sent = flush_sentinel(
            right_template, self.right_ts, at=self.sentinel_at,
            keys=tuple(self.keys),
            overrides={**self._key_overrides(right_template, 1),
                       **(right_overrides or {})},
        )
        return left_sent, right_sent

    def strip_sentinels(self, sink_df: DataFrame) -> DataFrame:
        """Remove the drain sentinels from the completed SINK TABLE —
        never from the streaming plan (predicate pushdown through the
        outer join would kill the sentinels before their watermark
        nodes; see :func:`flush_sentinel`). A row is a sentinel only if
        it carries the sentinel timestamp AND its side's auto-chosen
        key values, so real rows at the sentinel timestamp survive."""
        dtypes = dict(sink_df.dtypes)
        missing = [k for k in self.keys if k not in dtypes]
        if missing:
            # silently weakening to ts-only matching would strip real
            # rows at the sentinel timestamp — the exact gap this
            # method exists to close; refuse instead
            raise ValueError(
                f"strip_sentinels: join keys {missing} not in the sink "
                f"columns {sink_df.columns} — keep the key columns "
                "through the sink (or filter sentinels manually) so "
                "real rows at the sentinel timestamp cannot be stripped"
            )
        at_ts = F.to_timestamp(F.lit(self.sentinel_at))
        preds = []
        for side, ts_col in ((0, self.left_ts), (1, self.right_ts)):
            if ts_col not in dtypes:
                # a side whose ts column the sink dropped cannot be
                # identified — and matching on the key values ALONE
                # would strip real rows. For the RIGHT side under
                # inner/left joins the sentinel never reaches the sink,
                # so skipping is safe; but under how='left' the LEFT
                # sentinel IS emitted (NULL right payload, extreme key
                # values) and silently surviving it would be the exact
                # degradation the missing-keys path above refuses
                # (ADVICE r10) — raise instead.
                if side == 0 and self.how == "left":
                    raise ValueError(
                        f"strip_sentinels: left timestamp column "
                        f"{ts_col!r} not in the sink columns "
                        f"{sink_df.columns} — under how='left' the left "
                        "drain sentinel reaches the sink and cannot be "
                        "identified without its timestamp; keep "
                        f"{ts_col!r} through the sink (or filter "
                        "sentinels manually)"
                    )
                continue
            p = F.col(ts_col).cast("timestamp") == at_ts
            for k in self.keys:
                # cast the literal to the COLUMN's type before
                # comparing: the float32 sentinel values round on
                # storage, and an unrounded double literal would never
                # equal the stored float again
                p = p & (
                    F.col(k)
                    == F.lit(_sentinel_key_value(k, dtypes[k], side))
                    .cast(dtypes[k])
                )
            preds.append(p)
        if not preds:
            return sink_df
        pred = preds[0]
        for q in preds[1:]:
            pred = pred | q
        return sink_df.where(~F.coalesce(pred, F.lit(False)))


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
