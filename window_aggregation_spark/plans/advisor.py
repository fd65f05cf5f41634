"""Plan advice that needs DATA, not just schema: hints the static
validator (:mod:`..validation`) cannot give.

The motivating case (BENCH_r04): a running-frame window partitioned by a
column with a handful of distinct values (``w_events_running`` on
``event_type``) is CORRECT but serial at scale — each key's ordered
window runs in one task, so the plan stops scaling once executors
outnumber keys (the only sf1 ``linear_ratio`` > 1 in round 4). The
engine has the fix (:func:`..operators.skew.salted_running_agg`,
bit-equal two-phase chunking); this module tells you WHEN to route
through it.

Advice is opt-in (``window_aggregate(..., advise_skew=True)`` or a
direct :func:`skew_hints` call) because it runs a small sampling job —
data-touching work has no place in a default plan build.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from window_aggregation_spark.spec import WindowPlan


def skew_hints(
    df: DataFrame,
    plan: WindowPlan,
    *,
    parallelism: int | None = None,
    sample_rows: int = 100_000,
) -> list[str]:
    """Return human-readable hints when ``plan``'s partitioning would
    under-parallelize on ``df``'s data.

    Estimates the distinct count of the partition-key tuple on a bounded
    ``limit(sample_rows)`` sample (one small job — never a full scan).
    The estimate is approximate in BOTH directions: the limit() sample
    can only under-count (over-warn), but ``approx_count_distinct`` is
    HLL with ~5% default relative error and can over-estimate — so a
    key count sitting just below the parallelism threshold may fail to
    warn. The comparison therefore uses a small safety margin
    (``distinct < parallelism * 1.1``); treat a silent advisor as "no
    gross under-partitioning", not a proof of balance. A hint fires
    only when the spec is ordered (running/frame windows sort each key
    in one task; unordered whole-partition aggregates hash-partition
    fine at low key counts).
    """
    spec = plan.spec
    if not spec.partition_by or not spec.order_by:
        return []
    if parallelism is None:
        parallelism = df.sparkSession.sparkContext.defaultParallelism
    distinct = (
        df.limit(sample_rows)
        .select(
            F.approx_count_distinct(
                F.struct(*[F.col(c) for c in spec.partition_by])
            ).alias("d")
        )
        .first()["d"]
    )
    # 1.1x margin absorbs HLL's ~5% over-estimate band (docstring above);
    # borderline key counts should warn, not silently pass.
    if distinct >= parallelism * 1.1:
        return []
    keys = ", ".join(spec.partition_by)
    return [
        f"partition keys ({keys}) have ~{distinct} distinct values on a "
        f"{sample_rows}-row sample, below the parallelism ({parallelism}): "
        f"each key's ordered window runs in ONE task, so this plan stops "
        f"scaling past {distinct} executors. For decomposable running "
        f"aggregates, route through "
        f"operators.skew.salted_running_agg (bit-equal two-phase "
        f"value-range chunking, ~chunks-way parallel per key)."
    ]


def warn_if_skewed(
    df: DataFrame, plan: WindowPlan, *, parallelism: int | None = None
) -> None:
    """Emit :func:`skew_hints` through ``warnings.warn`` (UserWarning)."""
    for hint in skew_hints(df, plan, parallelism=parallelism):
        warnings.warn(hint, stacklevel=3)
