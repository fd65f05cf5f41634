"""Multi-spec window plans: several aggregate groups, each with its own
partition/order/frame spec, in one operator call — sequential semantics,
exchange-sharing regroup only when unobservable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark import (
    AggregateDef,
    OrderKey,
    WindowPlan,
    WindowSpecDef,
    window_aggregate,
    window_aggregate_multi,
)
from window_aggregation_spark.operators.window_aggregation import (
    _group_plans_by_partition_keys,
)

ROWS = [(i, ["a", "b"][i % 2], ["x", "y", "z"][i % 3], float(i)) for i in range(12)]
SCHEMA = "id int, g1 string, g2 string, v double"


def _p(keys, aggs, order=("id",)):
    return WindowPlan(
        spec=WindowSpecDef(
            partition_by=tuple(keys), order_by=tuple(OrderKey(o) for o in order)
        ),
        aggregates=tuple(aggs),
    )


def test_multi_equals_sequential_single_plans(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    plans = [
        _p(["g1"], [AggregateDef("s1", "accumulate", field="v")]),
        _p(["g2"], [AggregateDef("rn2", "row_number")]),
        _p(["g1"], [AggregateDef("rnk1", "rank")], order=("v",)),
    ]
    out = window_aggregate_multi(df, plans)
    seq = df
    for plan in plans:
        seq = window_aggregate(seq, plan)
    # the regroup may append alias columns in a different order; values and
    # names must match exactly once both sides project the same column order
    cols = sorted(out.columns)
    assert sorted(seq.columns) == cols
    assert (
        out.select(*cols).orderBy("id").collect()
        == seq.select(*cols).orderBy("id").collect()
    )


def test_multi_regroups_same_keys(spark):
    plans = [
        _p(["g1"], [AggregateDef("a", "accumulate", field="v")]),
        _p(["g2"], [AggregateDef("b", "row_number")]),
        _p(["g1"], [AggregateDef("c", "rank")], order=("v",)),
    ]
    grouped = _group_plans_by_partition_keys(plans)
    assert [tuple(p.spec.partition_by) for p in grouped] == [
        ("g1",), ("g1",), ("g2",)
    ]


def test_multi_preserves_order_on_cross_plan_dependency(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    plans = [
        _p(["g2"], [AggregateDef("run_v", "accumulate", field="v")]),
        # reads the previous plan's output -> no reorder, sees run_v
        _p(["g1"], [AggregateDef("max_run", "max", field="run_v")]),
    ]
    assert _group_plans_by_partition_keys(plans) == plans
    out = window_aggregate_multi(df, plans).orderBy("id").collect()
    expected = window_aggregate(
        window_aggregate(df, plans[0]), plans[1]
    ).orderBy("id").collect()
    assert out == expected


def test_multi_preserves_order_on_column_arg_dependency(spark):
    """corr/covar read a SECOND column through args[0]; a later plan whose
    args[0] is an earlier plan's output alias is a cross-plan dependency
    (round-2 advice) — the regroup must keep order, and execution must see
    the earlier plan's column."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plans = [
        _p(["g2"], [AggregateDef("run_v", "accumulate", field="v")]),
        # args[0]='run_v' reads the previous plan's output -> no reorder
        _p(["g1"], [AggregateDef("c", "corr", field="v", args=("run_v",))],
           order=("v",)),
    ]
    assert _group_plans_by_partition_keys(plans) == plans
    out = window_aggregate_multi(df, plans).orderBy("id").collect()
    expected = window_aggregate(
        window_aggregate(df, plans[0]), plans[1]
    ).orderBy("id").collect()
    assert out == expected
    # and the regroup stays ENABLED when the column arg reads a plain input
    indep = [
        _p(["g2"], [AggregateDef("run_v", "accumulate", field="v")]),
        _p(["g1"], [AggregateDef("c", "covar_samp", field="v", args=("id",))],
           order=("v",)),
        _p(["g2"], [AggregateDef("rn", "row_number")]),
    ]
    grouped = _group_plans_by_partition_keys(indep)
    assert [tuple(p.spec.partition_by) for p in grouped] == [
        ("g2",), ("g2",), ("g1",)
    ]


def test_multi_spec_sql_rejects_column_arg_cross_read(spark):
    from window_aggregation_spark.plans.sql_gen import plans_to_sql

    dep = [
        _p(["g1"], [AggregateDef("x", "accumulate", field="v")]),
        _p(["g2"], [AggregateDef("c", "corr", field="v", args=("x",))],
           order=("v",)),
    ]
    with pytest.raises(ValueError, match="reads other plans' outputs"):
        plans_to_sql(dep, "t", ["id", "g1", "g2", "v"])


def test_multi_duplicate_alias_keeps_order(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    plans = [
        _p(["g1"], [AggregateDef("x", "accumulate", field="v")]),
        _p(["g2"], [AggregateDef("x", "row_number")]),  # later plan wins
    ]
    assert _group_plans_by_partition_keys(plans) == plans
    out = window_aggregate_multi(df, plans)
    # the surviving x is the row_number (int), not the sum (double)
    assert dict(out.dtypes)["x"] == "int"


def test_multi_declared_schema_projects_combined_output(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    plans = [
        _p(["g1"], [AggregateDef("s", "accumulate", field="v")]),
        _p(["g2"], [AggregateDef("rn", "row_number")]),
    ]
    out = window_aggregate_multi(
        df, plans, declared_schema=("id", "rn", "s")
    )
    assert out.columns == ["id", "rn", "s"]


def test_multi_spec_sql_backend_parity(spark):
    """plans_to_sql renders N plans as one SELECT with per-aggregate OVER
    clauses — results must equal the DataFrame path exactly."""
    from window_aggregation_spark.plans.sql_gen import plans_to_sql

    df = spark.createDataFrame(ROWS, SCHEMA)
    plans = [
        _p(["g1"], [AggregateDef("s1", "accumulate", field="v")]),
        _p(["g2"], [AggregateDef("rn2", "row_number")]),
        _p(["g1"], [AggregateDef("c1", "corr", field="v", args=("id",))],
           order=("v",)),
    ]
    api = window_aggregate_multi(df, plans)
    df.createOrReplaceTempView("multi_sql_t")
    sql = plans_to_sql(
        plans, "multi_sql_t", df.columns, input_types=dict(df.dtypes)
    )
    via_sql = spark.sql(sql)
    cols = sorted(api.columns)
    assert sorted(via_sql.columns) == cols
    assert (
        api.select(*cols).orderBy("id").collect()
        == via_sql.select(*cols).orderBy("id").collect()
    )


def test_multi_spec_sql_rejects_order_dependent_shapes(spark):
    from window_aggregation_spark.plans.sql_gen import plans_to_sql

    dep = [
        _p(["g1"], [AggregateDef("x", "accumulate", field="v")]),
        _p(["g2"], [AggregateDef("y", "max", field="x")]),
    ]
    with pytest.raises(ValueError, match="reads other plans' outputs"):
        plans_to_sql(dep, "t", ["id", "g1", "g2", "v"])
    dup = [
        _p(["g1"], [AggregateDef("x", "accumulate", field="v")]),
        _p(["g2"], [AggregateDef("x", "row_number")]),
    ]
    with pytest.raises(ValueError, match="duplicate aggregate aliases"):
        plans_to_sql(dup, "t", ["id", "g1", "g2", "v"])


def test_multi_validates_each_plan(spark):
    from window_aggregation_spark import ValidationError

    df = spark.createDataFrame(ROWS, SCHEMA)
    plans = [
        _p(["g1"], [AggregateDef("s", "accumulate", field="nope")]),
    ]
    with pytest.raises(ValidationError):
        window_aggregate_multi(df, plans)
