"""The percentile rank-join rewrite: O(1)/row equi-joins replacing
O(frame)/row buffers for DISCRETE_PERCENTILE / MEDIAN over running frames
ordered by the aggregated field — both directions. Results must be
BIT-identical to the general window composition (collect_list / Hive
percentile)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from window_aggregation_spark import (
    AggregateDef,
    OrderKey,
    WindowPlan,
    WindowSpecDef,
    window_aggregate,
)

ROWS = [
    (i, ["a", "b", "c"][i % 3], float([7, 3, 3, 9, 1, 5, 8, 2, 6, 4][i % 10]))
    for i in range(60)
] + [(100, "a", None), (101, "d", None)]  # null values and a null-only group
SCHEMA = "id int, g string, v double"


def _plan(function, direction, args=()):
    from window_aggregation_spark.spec import Direction

    return WindowPlan(
        spec=WindowSpecDef(
            partition_by=("g",),
            order_by=(OrderKey("v", Direction.parse(direction)),),
        ),
        aggregates=(
            AggregateDef("out", function, field="v", args=tuple(args)),
        ),
    )


def _general_expected(df, function, direction, p):
    """The general-composition ground truth, built directly from Spark's
    own window aggregates (what the operator would do without the
    rewrite)."""
    order = F.col("v").desc() if direction == "descending" else F.col("v").asc()
    w = Window.partitionBy("g").orderBy(order)
    if function == "discrete_percentile":
        vals = F.array_sort(F.collect_list("v").over(w))
        k = F.greatest(F.ceil(F.lit(p) * F.size(vals)), F.lit(1)).cast("int")
        col = F.get(vals, k - 1)
    else:
        col = F.percentile(F.col("v"), F.lit(p)).over(w).cast("double")
    return df.withColumn("out", col)


@pytest.mark.parametrize("direction", ["ascending", "descending"])
@pytest.mark.parametrize(
    "function,args,p",
    [
        ("discrete_percentile", ("0.5",), 0.5),
        ("discrete_percentile", ("0.25",), 0.25),
        ("discrete_percentile", ("0.9",), 0.9),
        ("median", (), 0.5),
    ],
)
def test_rank_join_matches_general_composition(spark, function, args, p,
                                               direction):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = window_aggregate(df, _plan(function, direction, args))
    expected = _general_expected(df, function, direction, p)
    cols = ["id", "g", "v", "out"]
    assert (
        got.select(cols).orderBy("id").collect()
        == expected.select(cols).orderBy("id").collect()
    )


@pytest.mark.parametrize("direction", ["ascending", "descending"])
@pytest.mark.parametrize(
    "function,args",
    [
        ("discrete_percentile", ("0.5",)),
        ("median", ()),
    ],
)
def test_rank_join_plan_has_no_per_row_buffers(spark, function, args,
                                               direction):
    """Both directions must take the rank-join path: no collect_list (the
    O(frame) array) and no percentile window aggregate (the O(frame)
    accumulate-and-sort buffer) may appear in the physical plan."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = window_aggregate(df, _plan(function, direction, args))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert "percentile(" not in plan


@pytest.mark.parametrize("direction", ["ascending", "descending"])
def test_one_pass_strategy_matches_rank_lookup(spark, direction):
    """percentile_strategy='one_pass' (the explicit small-frames assertion)
    must produce bit-identical results through the single-WindowExec plan —
    Hive percentile appears in the plan, the union/rank-lookup does not."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = _plan("median", direction)
    default = window_aggregate(df, plan)
    one_pass = window_aggregate(df, plan, percentile_strategy="one_pass")
    cols = ["id", "g", "v", "out"]
    assert (
        one_pass.select(cols).orderBy("id").collect()
        == default.select(cols).orderBy("id").collect()
    )
    jplan = one_pass._jdf.queryExecution().executedPlan().toString()
    assert "percentile(" in jplan
    assert "__pr_rk" not in jplan


def test_percentile_strategy_validated(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="percentile_strategy"):
        window_aggregate(
            df, _plan("median", "ascending"), percentile_strategy="auto"
        )


def test_rank_join_not_applied_when_ordered_by_other_field(spark):
    """Ordered by a different column, frames are not value prefixes — the
    rewrite must NOT fire and the general path must run."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("g",), order_by=(OrderKey("id"),)),
        aggregates=(AggregateDef("out", "median", field="v"),),
    )
    out = window_aggregate(df, plan)
    jplan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile(" in jplan  # general Hive-percentile window path
    # spot-check running-median semantics over id order
    rows = {r["id"]: r["out"] for r in out.collect()}
    assert rows[0] == 7.0  # first row of group a: median of [7]
