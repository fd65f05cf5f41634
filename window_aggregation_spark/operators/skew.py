"""Skew mitigation for windowed aggregation at scale.

``WindowExec`` sorts each partition-key group inside ONE task: a running
aggregate over a hot key (billions of rows under one key at 100 TB)
serializes onto a single core and can't spill its way out of the wall-clock
hit. :func:`salted_running_sum` is the standard two-phase decomposition:

1. **Chunk** each key's rows by ORDER-VALUE ranges (boundaries from an
   ``approxQuantile`` sketch — one cheap pass, driver gets ~``chunks``
   doubles). Chunking by value keeps equal order values in one chunk, which
   makes the result exactly RANGE-frame semantics (peers included),
   deterministic under ties.
2. **Local** running sums within (key, chunk) — ``chunks``-way parallel
   where the plain window is serial.
3. **Offsets**: per-(key, chunk) totals (tiny — keys x chunks rows)
   cumulated over chunk order, broadcast-joined back, added to the local sum.

Result is bit-equal (for exact-typed fields; integral doubles, longs,
decimals) to ``sum(field) OVER (PARTITION BY keys ORDER BY order_col RANGE
UNBOUNDED PRECEDING)`` while the longest serial run drops from O(partition)
to O(partition / chunks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _merge_sum(local, off):
    # A null LOCAL (all field values null so far in this chunk) must still
    # surface earlier chunks' offset, and vice versa; only both-null stays
    # null — matching the plain running window sum exactly (review finding).
    return F.when(local.isNull() & off.isNull(), F.lit(None)).otherwise(
        F.coalesce(local, F.lit(0)) + F.coalesce(off, F.lit(0))
    )


# aggregate name -> (partial fn over rows, combine fn over chunk partials,
# merge of the local running value with the combined offset of all earlier
# chunks). Requires decomposability: agg(A ∪ B) = merge(agg(A), agg(B));
# note count COMBINES with sum (count of a union is the sum of counts).
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum, _merge_sum),
    "count": (F.count, F.sum, lambda local, off: local + F.coalesce(off, F.lit(0))),
    "min": (F.min, F.min, lambda local, off: F.least(local, F.coalesce(off, local))),
    "max": (F.max, F.max, lambda local, off: F.greatest(local, F.coalesce(off, local))),
}


def salted_running_agg(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    field: str,
    *,
    agg: str = "sum",
    chunks: int = 32,
    alias: str = "run_agg",
    quantile_error: float = 0.01,
) -> DataFrame:
    """Append ``alias`` = running (RANGE-semantics) ``agg`` of ``field`` per
    ``keys`` ordered by ``order_col``, computed in two phases so no single
    task owns a whole hot key. ``agg`` must be decomposable
    (sum/count/min/max). ``quantile_error`` only shifts chunk boundaries —
    correctness never depends on sketch precision (equal order values always
    land in one chunk), it just balances chunk sizes."""
    if agg not in _DECOMPOSABLE:
        raise ValueError(f"agg must be one of {sorted(_DECOMPOSABLE)}")
    fn, combine, merge = _DECOMPOSABLE[agg]

    probs = [i / chunks for i in range(1, chunks)]
    boundaries = (
        df.approxQuantile(order_col, probs, quantile_error) if probs else []
    )

    bucket = F.lit(0)
    for b in sorted(set(boundaries)):
        bucket = bucket + F.when(F.col(order_col) > b, 1).otherwise(0)
    chunked = df.withColumn("__chunk", bucket)

    w_local = Window.partitionBy(*keys, "__chunk").orderBy(F.col(order_col))
    local = chunked.withColumn("__local", fn(field).over(w_local))

    w_off = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        chunked.groupBy(*keys, "__chunk")
        .agg(fn(field).alias("__total"))
        .withColumn("__offset", combine("__total").over(w_off))
        .select(*keys, "__chunk", "__offset")
    )

    joined = local.join(F.broadcast(offsets), on=[*keys, "__chunk"], how="left")
    return joined.withColumn(
        alias, merge(F.col("__local"), F.col("__offset"))
    ).drop("__chunk", "__local", "__offset")


def salted_running_sum(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    field: str,
    *,
    chunks: int = 32,
    alias: str = "run_sum",
) -> DataFrame:
    """Running sum specialization of :func:`salted_running_agg`."""
    return salted_running_agg(
        df, keys, order_col, field, agg="sum", chunks=chunks, alias=alias
    )
