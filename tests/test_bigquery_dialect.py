"""BigQuery dialect: the generated-SQL backend's third dialect must render
the reference's warehouse-pushdown templates character-for-character
(``functionBQSqlMap``, ``WindowAggregation.java:75-93``; string asserts
mirror ``WindowAggregationTest.java:193-343``). Pure string tests — no
SparkSession needed."""

from __future__ import annotations

import pytest

from window_aggregation_spark.functions.registry import bigquery_expression
from window_aggregation_spark.spec import (
    AggregateDef,
    OrderKey,
    WindowPlan,
    WindowSpecDef,
)
from window_aggregation_spark.plans.sql_gen import plan_to_sql

OVER = "OVER (PARTITION BY g ORDER BY id ASC)"


def _expr(function, field=None, args=(), ignore_nulls=True):
    agg = AggregateDef(
        "a1", function, field=field, args=tuple(args), ignore_nulls=ignore_nulls
    )
    return bigquery_expression(agg, OVER)


def _head(expr):
    """The rendered expression without the OVER clause — the exact string
    the reference test suite asserts."""
    assert expr.endswith(" " + OVER)
    return expr[: -len(OVER) - 1]


# -- the 14 reference functions, template-for-template ----------------------

def test_bq_first():
    # ignoreNull flag OR literal-true args[0] (the reference quirk)
    assert _head(_expr("first", "colname", args=("true",),
                       ignore_nulls=False)) == "FIRST_VALUE(colname IGNORE NULLS)"
    assert _head(_expr("first", "colname",
                       ignore_nulls=True)) == "FIRST_VALUE(colname IGNORE NULLS)"
    assert _head(_expr("first", "colname", args=("false",),
                       ignore_nulls=False)) == "FIRST_VALUE(colname RESPECT NULLS)"


def test_bq_last():
    assert _head(_expr("last", "colname", args=("true",),
                       ignore_nulls=False)) == "LAST_VALUE(colname IGNORE NULLS)"
    assert _head(_expr("last", "colname",
                       ignore_nulls=True)) == "LAST_VALUE(colname IGNORE NULLS)"
    assert _head(_expr("last", "colname", args=("false",),
                       ignore_nulls=False)) == "LAST_VALUE(colname RESPECT NULLS)"


def test_bq_ntile():
    assert _head(_expr("ntile", "colname", args=("2",))) == "NTILE(2)"
    assert _head(_expr("ntile", "colname", args=("10",))) == "NTILE(10)"
    assert _head(_expr("ntile", "colname", args=("999",))) == "NTILE(999)"


def test_bq_continuous_percentile():
    assert _head(
        _expr("continuous_percentile", "colname", args=("0.1234",))
    ) == "PERCENTILE_CONT(colname, 0.1234)"


def test_bq_discrete_percentile():
    assert _head(
        _expr("discrete_percentile", "colname", args=("0.1234",))
    ) == "PERCENTILE_DISC(colname, 0.1234)"


def test_bq_lead_lag():
    assert _head(_expr("lead", "colname", args=("1",))) == "LEAD(colname, 1)"
    assert _head(_expr("lead", "colname", args=("99",))) == "LEAD(colname, 99)"
    assert _head(_expr("lag", "colname", args=("1",))) == "LAG(colname, 1)"
    assert _head(_expr("lag", "colname", args=("99",))) == "LAG(colname, 99)"


def test_bq_argless_functions():
    assert _head(_expr("rank")) == "RANK()"
    assert _head(_expr("dense_rank")) == "DENSE_RANK()"
    assert _head(_expr("percent_rank")) == "PERCENT_RANK()"
    assert _head(_expr("row_number")) == "ROW_NUMBER()"
    assert _head(_expr("cume_dist", "colname")) == "CUME_DIST()"


def test_bq_median_fixed_half():
    # the reference ignores args for MEDIAN: always 0.5
    assert _head(
        _expr("median", "colname", args=("0.1234",))
    ) == "PERCENTILE_CONT(colname, 0.5)"


def test_bq_accumulate():
    assert _head(
        _expr("accumulate", "colname", args=("0.1234",))
    ) == "SUM(colname)"


def test_bq_reference_enum_names_resolve():
    # reference spec strings use enum names; same templates must render
    assert _head(_expr("N_TILE", "colname", args=("2",))) == "NTILE(2)"
    assert _head(
        _expr("DISCRETE_PERCENTILE", "colname", args=("0.5",))
    ) == "PERCENTILE_DISC(colname, 0.5)"


# -- extension surface ------------------------------------------------------

def test_bq_nth_value_nulls_inside_parens():
    assert _head(
        _expr("nth_value", "colname", args=("2",), ignore_nulls=True)
    ) == "NTH_VALUE(colname, 2 IGNORE NULLS)"
    assert _head(
        _expr("nth_value", "colname", args=("2",), ignore_nulls=False)
    ) == "NTH_VALUE(colname, 2)"


def test_bq_moments_use_float64():
    expr = _expr("corr", "x", args=("y",))
    assert "FLOAT64" in expr and "DOUBLE" not in expr


def test_bq_identifier_quoting():
    # simple names bare (reference templates), reserved/odd names backticked
    assert _head(_expr("accumulate", "weird name")) == "SUM(`weird name`)"


def test_bq_full_select_no_boundary_casts():
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("g",), order_by=(OrderKey("id"),)
        ),
        aggregates=(
            AggregateDef("r", "rank"),
            AggregateDef("p90", "continuous_percentile", field="v",
                         args=("0.9",)),
        ),
    )
    sql = plan_to_sql(
        plan, "t", ["g", "id", "v"], dialect="bigquery",
        input_types={"g": "string", "id": "int", "v": "double"},
    )
    assert "RANK() OVER (PARTITION BY g ORDER BY id ASC) AS r" in sql
    assert ("PERCENTILE_CONT(v, 0.9) OVER (PARTITION BY g ORDER BY id ASC) "
            "AS p90") in sql
    # BigQuery results carry engine-native types, exactly like the
    # reference's pushdown — no CAST wrappers
    assert "CAST(" not in sql


# -- random-plan structural properties (r5): the dialect must stay total
# and well-formed as the registry grows, not just on the fixed templates


def test_bq_dialect_renders_every_random_plan():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tests.test_property_dual_backend import (
        framed_plan,
        range_plan,
        unframed_plan,
    )

    cols = ["id", "grp", "val", "small"]
    types = {"id": "int", "grp": "string", "val": "double", "small": "int"}

    @settings(max_examples=60, deadline=None)
    @given(plan=st.one_of(unframed_plan(), framed_plan(), range_plan()))
    def check(plan):
        sql = plan_to_sql(plan, "t", cols, dialect="bigquery",
                          input_types=types)
        # one aliased window expression per aggregate, in declared order
        pos = -1
        for agg in plan.aggregates:
            nxt = sql.find(f" AS {agg.alias}")
            assert nxt > pos, f"alias {agg.alias} missing/out of order:\n{sql}"
            pos = nxt
        assert sql.count("OVER (") >= len(plan.aggregates)
        # frame text mirrors the spec
        from window_aggregation_spark.spec import FrameType
        if plan.spec.frame_type is FrameType.ROW:
            assert "ROWS BETWEEN" in sql
        elif plan.spec.frame_type is FrameType.RANGE:
            assert "RANGE BETWEEN" in sql
        # Spark-only spellings must not leak into the BQ dialect
        assert "DOUBLE" not in sql and "percentile(" not in sql
        # balanced parens = no truncated template splice
        assert sql.count("(") == sql.count(")")

    check()
