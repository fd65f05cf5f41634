"""Stream-static enrichment join: annotate an unbounded event stream with
a bounded dimension table.

Extension scope (SURVEY §2.5) — the third and simplest streaming join
shape (tumbling/stateful aggregation and stream-stream interval join live
in their own modules): every micro-batch inner/left-joins against a static
DataFrame. No watermarks and no join state are involved — the static side
is re-resolved per micro-batch by Structured Streaming, which is what
makes a *file-backed* dimension pick up replaced data between batches
(the classic slowly-refreshing lookup table).

Scale shape: dimensions that fit an executor get the explicit
``broadcast`` hint — each micro-batch then joins map-side with NO shuffle
of the stream (the hot path for 100 TB/day streams against
million-row dims). For larger dims pass ``broadcast=False``: the stream
micro-batch shuffles on the key, which is correct but pays one exchange
per batch — and if one key dominates the stream,
:func:`~window_aggregation_spark.operators.skew.salted_join` applies
unchanged (its salt explode works on streaming frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    *,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Join a streaming frame to a static dimension on ``keys``.

    ``how`` is ``left`` (default — events with no dimension row survive
    with NULLs, the usual enrichment contract) or ``inner``. Streaming
    left joins require the STREAM on the left; Spark enforces it, we
    check early for a clearer error. Column collisions outside ``keys``
    are the caller's to resolve (same contract as the other joins).
    """
    if not stream.isStreaming:
        raise ValueError("enrich_stream: left side must be a streaming frame")
    if dim.isStreaming:
        raise ValueError(
            "enrich_stream: dim must be static — for two streams use "
            "streaming.interval_join"
        )
    if how not in ("left", "inner"):
        raise ValueError(f"enrich_stream: unsupported how={how!r} (left/inner)")
    rhs = F.broadcast(dim) if broadcast else dim
    return stream.join(rhs, on=keys, how=how)
