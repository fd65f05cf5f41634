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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _merge_sum(local, off):
    # A null LOCAL (all field values null so far in this chunk) must still
    # surface earlier chunks' offset, and vice versa; only both-null stays
    # null — matching the plain running window sum exactly (review finding).
    return F.when(local.isNull() & off.isNull(), F.lit(None)).otherwise(
        F.coalesce(local, F.lit(0)) + F.coalesce(off, F.lit(0))
    )


def _merge_count(local, off):
    return local + F.coalesce(off, F.lit(0))


# aggregate name -> (partial fn over rows, combine fn over chunk partials,
# merge of the local running value with the combined offset of all earlier
# chunks). Requires decomposability: agg(A ∪ B) = merge(agg(A), agg(B));
# note count COMBINES with sum (count of a union is the sum of counts).
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum, _merge_sum),
    "count": (F.count, F.sum, _merge_count),
    "min": (F.min, F.min, lambda local, off: F.least(local, F.coalesce(off, local))),
    "max": (F.max, F.max, lambda local, off: F.greatest(local, F.coalesce(off, local))),
}


def _sum_double(field):
    return F.sum(F.col(field).cast("double"))


def _sum_squares(field):
    v = F.col(field).cast("double")
    return F.sum(v * v)


def _var_samp_of(m):
    # Power-sum variance: (Σx² − (Σx)²/n) / (n−1). EXACT (hence
    # order-independent, hence chunking-independent) whenever the inputs
    # are integral-valued doubles, which is the reproducibility contract
    # this module shares with the two-field window moments
    # (registry power-sum formulation). The greatest(0, ·) clamp only
    # absorbs the last-ulp negative that non-integral inputs can produce;
    # n>1 guards the ANSI divide (stddev_samp of a 1-row frame is null).
    n, s, s2 = m["n"], m["s"], m["s2"]
    return F.when(
        n > 1, F.greatest(F.lit(0.0), (s2 - s * s / n) / (n - 1))
    )


# Composite aggregates decompose into several sum-combining components
# (power sums + count), merged per-component exactly like "sum"/"count"
# above, then finished by ONE shared expression — so the salted result is
# bit-equal to the same power-sum expression over a plain window.
# component name -> (partial fn over rows, merge fn); combine is always sum.
_COMPOSITE = {
    "avg": (
        {"s": (F.sum, _merge_sum), "n": (F.count, _merge_count)},
        lambda m: F.when(m["n"] > 0, m["s"] / m["n"]),
    ),
    "var_samp": (
        {
            "s": (_sum_double, _merge_sum),
            "s2": (_sum_squares, _merge_sum),
            "n": (F.count, _merge_count),
        },
        _var_samp_of,
    ),
    "stddev": (
        {
            "s": (_sum_double, _merge_sum),
            "s2": (_sum_squares, _merge_sum),
            "n": (F.count, _merge_count),
        },
        lambda m: F.sqrt(_var_samp_of(m)),
    ),
}


def _bucket_of(col: Column, bounds: list) -> Column:
    """Chunk index = |{b in bounds : col > b}| as a BALANCED binary
    ``when`` tree: O(log chunks) comparisons per row with short-circuit
    evaluation, vs the O(chunks) linear chain it replaced — which also
    re-evaluated ``col``'s expression per term after projection collapse
    (ruinous when the order column is computed, e.g. a timezone cast)."""

    def tree(lo: int, hi: int) -> Column:
        # bucket index is somewhere in [lo, hi]; bounds[lo:hi] still split it
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(col > bounds[mid], tree(mid + 1, hi)).otherwise(
            tree(lo, mid)
        )

    return tree(0, len(bounds))


def chunk_boundaries(
    df: DataFrame,
    order_col: str,
    *,
    chunks: int = 32,
    quantile_error: float = 0.01,
) -> list:
    """Compute the ``chunks - 1`` approximate quantile boundaries of
    ``order_col`` once, for reuse across repeated :func:`salted_running_agg`
    calls over the same table (each call otherwise runs its own
    driver-coordinated ``approxQuantile`` pass). ANY boundary list is
    correct — boundaries only balance chunk sizes — so reusing slightly
    stale boundaries after appends is safe; recompute when the order-column
    distribution shifts enough that chunks go unbalanced."""
    probs = [i / chunks for i in range(1, chunks)]
    return df.approxQuantile(order_col, probs, quantile_error) if probs else []


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
    boundaries: "list | None" = None,
) -> DataFrame:
    """Append ``alias`` = running (RANGE-semantics) ``agg`` of ``field`` per
    ``keys`` ordered by ``order_col``, computed in two phases so no single
    task owns a whole hot key. ``agg`` is either directly decomposable
    (sum/count/min/max) or a composite over power sums
    (avg/var_samp/stddev — sample semantics, like SQL STDDEV_SAMP).
    ``quantile_error`` only shifts chunk boundaries —
    correctness never depends on sketch precision (equal order values always
    land in one chunk), it just balances chunk sizes. Pass ``boundaries``
    (from :func:`chunk_boundaries`, computed once) to skip this call's own
    approxQuantile pass when salting the same table repeatedly; ``chunks``
    is ignored then."""
    if agg in _DECOMPOSABLE:
        fn, combine, merge = _DECOMPOSABLE[agg]
        comps = {"v": (fn, combine, merge)}

        def finalize(m):
            return m["v"]

    elif agg in _COMPOSITE:
        comp_defs, finalize = _COMPOSITE[agg]
        comps = {
            name: (partial, F.sum, merge)
            for name, (partial, merge) in comp_defs.items()
        }
    else:
        raise ValueError(
            f"agg must be one of {sorted(set(_DECOMPOSABLE) | set(_COMPOSITE))}"
        )

    if boundaries is None:
        boundaries = chunk_boundaries(
            df, order_col, chunks=chunks, quantile_error=quantile_error
        )

    chunked = df.withColumn(
        "__chunk", _bucket_of(F.col(order_col), sorted(set(boundaries)))
    )

    w_local = Window.partitionBy(*keys, "__chunk").orderBy(F.col(order_col))
    local = chunked
    for name, (partial, _, _) in comps.items():
        local = local.withColumn(f"__local_{name}", partial(field).over(w_local))

    w_off = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Per-chunk totals are a SECOND pass over the input, on purpose: a
    # map-side-combined groupBy exchanges only ~keys x chunks partial
    # rows, so the extra cost is one scan + the O(log chunks) bucket
    # projection. (An r5 attempt moved the totals into the window stage
    # as whole-partition frames + dropDuplicates — review showed that
    # shape re-shuffles and re-sorts the ENTIRE table for the offsets
    # branch, which loses badly at scale; the scan is the cheap part.)
    offsets = chunked.groupBy(*keys, "__chunk").agg(
        *[
            partial(field).alias(f"__total_{name}")
            for name, (partial, _, _) in comps.items()
        ]
    )
    for name, (_, combine, _) in comps.items():
        offsets = offsets.withColumn(
            f"__off_{name}", combine(f"__total_{name}").over(w_off)
        )
    offsets = offsets.select(
        *keys, "__chunk", *[f"__off_{name}" for name in comps]
    )

    joined = local.join(F.broadcast(offsets), on=[*keys, "__chunk"], how="left")
    merged = {
        name: merge(F.col(f"__local_{name}"), F.col(f"__off_{name}"))
        for name, (_, _, merge) in comps.items()
    }
    return joined.withColumn(alias, finalize(merged)).drop(
        "__chunk",
        *[f"__local_{name}" for name in comps],
        *[f"__off_{name}" for name in comps],
    )


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


# ---------------------------------------------------------------------------
# salted equi-join
# ---------------------------------------------------------------------------

def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salting decomposition: a key holding a
    disproportionate share of ``left`` (the fact side) no longer lands in
    one shuffle partition.

    Every ``left`` row gets a per-row salt in ``[0, salts)`` derived from
    its physical position (``monotonically_increasing_id``), NOT from a
    hash of its values: raw fact data routinely contains byte-identical
    duplicate rows under the hot key, and a value hash would give them all
    the same salt — re-creating exactly the skew this operator exists to
    fix (a value hash also fails outright on unhashable column types like
    maps). Positional salts cycle 0..salts-1 within each scan partition,
    so even a single all-duplicate key spreads evenly. Result-set equality
    to the plain join is unaffected — the salt only routes rows, and the
    right side supplies every salt for its key. ``right`` (the dimension
    side) is replicated once per salt via ``explode(sequence(...))``; the
    join runs on ``(on..., salt)``, splitting each hot key's rows across
    ``salts`` tasks. Result set is EXACTLY the plain join's: each left row
    carries one salt, and the right side supplies every salt for its key,
    so each (left row, right row) pair meets exactly once.

    Cost: ``salts``x replication of the right side's shuffle volume — use
    for joins where the right side is far smaller than the hot key's row
    count but too big (or too streaming) to broadcast outright.

    When to reach for this instead of AQE: ``spark.sql.adaptive.skewJoin``
    re-splits skewed *partitions* at runtime and is the right default for
    batch — but it only kicks in for sort-merge joins, after a completed
    map stage, and not in Structured Streaming joins; explicit salting
    also keeps working when the skew is a single key that exceeds one
    task's memory even after AQE's split factor.

    ``how`` is ``inner`` or ``left`` (each left row keeps exactly its own
    salt, so left-outer semantics survive salting unchanged).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: unsupported how={how!r} (inner/left)")
    if salts < 1:
        raise ValueError("salted_join: salts must be >= 1")
    lsalt = F.pmod(F.monotonically_increasing_id(), F.lit(salts))
    lhs = left.withColumn("__salt", lsalt.cast("int"))
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    return lhs.join(rhs, on=[*on, "__salt"], how=how).drop("__salt")
