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


def salted_running_sum(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    field: str,
    *,
    chunks: int = 32,
    alias: str = "run_sum",
) -> DataFrame:
    """Append ``alias`` = running (RANGE-semantics) sum of ``field`` per
    ``keys`` ordered by ``order_col``, computed in two phases so no single
    task owns a whole hot key."""
    probs = [i / chunks for i in range(1, chunks)]
    boundaries = df.approxQuantile(order_col, probs, 0.001) if probs else []

    bucket = F.lit(0)
    for b in sorted(set(boundaries)):
        bucket = bucket + F.when(F.col(order_col) > b, 1).otherwise(0)
    chunked = df.withColumn("__chunk", bucket)

    w_local = Window.partitionBy(*keys, "__chunk").orderBy(F.col(order_col))
    local = chunked.withColumn("__local", F.sum(field).over(w_local))

    w_off = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        chunked.groupBy(*keys, "__chunk")
        .agg(F.sum(field).alias("__total"))
        .withColumn("__offset", F.sum("__total").over(w_off))
        .select(*keys, "__chunk", "__offset")
    )

    joined = local.join(F.broadcast(offsets), on=[*keys, "__chunk"], how="left")
    return joined.withColumn(
        alias, F.col("__local") + F.coalesce(F.col("__offset"), F.lit(0))
    ).drop("__chunk", "__local", "__offset")
