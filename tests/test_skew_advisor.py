"""Data-aware plan advice: the low-cardinality running-window hint
(VERDICT r4 'What's wrong #3' — the w_events_running shape)."""

from __future__ import annotations

import warnings

from pyspark.sql import functions as F

import pytest

from window_aggregation_spark.operators.window_aggregation import (
    window_aggregate,
)
from window_aggregation_spark.plans.advisor import skew_hints
from window_aggregation_spark.sources.io import read_table
from window_aggregation_spark.spec import (
    AggregateDef,
    OrderKey,
    WindowPlan,
    WindowSpecDef,
)


def _events_plan() -> WindowPlan:
    return WindowPlan(
        spec=WindowSpecDef(
            partition_by=("event_type",),
            order_by=(OrderKey("ts"), OrderKey("event_id")),
        ),
        aggregates=(AggregateDef("run_value", "accumulate", field="value"),),
    )


def test_low_cardinality_ordered_partition_hints(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    hints = skew_hints(events, _events_plan(), parallelism=32)
    assert len(hints) == 1
    assert "salted_running_agg" in hints[0]
    assert "event_type" in hints[0]


def test_high_cardinality_and_unordered_plans_stay_silent(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    high = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("l_orderkey",), order_by=(OrderKey("l_linenumber"),)
        ),
        aggregates=(AggregateDef("rq", "accumulate", field="l_quantity"),),
    )
    assert skew_hints(li, high, parallelism=32) == []
    # unordered whole-partition aggregates hash fine at low key counts
    unordered = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_returnflag",)),
        aggregates=(AggregateDef("mx", "max", field="l_quantity"),),
    )
    assert skew_hints(li, unordered, parallelism=32) == []


def _routable_plan() -> WindowPlan:
    # single ascending order key: the shape salted_running_agg computes
    # (RANGE running frame; multi-key orders are ineligible by design)
    return WindowPlan(
        spec=WindowSpecDef(
            partition_by=("event_type",), order_by=(OrderKey("ts"),)
        ),
        aggregates=(AggregateDef("run_value", "accumulate", field="value"),),
    )


def test_skew_mitigation_routes_hot_keys_and_matches_plain(spark, sf_dir):
    from window_aggregation_spark.operators.window_aggregation import (
        _salted_route,
    )

    # one-key partition: hints always fire under the local[4] test session
    events = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value", "ts")
        .withColumn("event_type", F.lit("only"))
    )
    plan = _routable_plan()
    routed = _salted_route(events, plan)
    assert routed is not None, "hints fired + eligible shape must route"
    # the routed physical plan is the two-phase chunked rewrite
    assert "__chunk" in routed._jdf.queryExecution().optimizedPlan().toString()
    plain = window_aggregate(events, plan)
    key = ["event_id"]
    r = {t["event_id"]: round(t["run_value"], 4)
         for t in routed.select(*key, "run_value").collect()}
    p = {t["event_id"]: round(t["run_value"], 4)
         for t in plain.select(*key, "run_value").collect()}
    assert r == p
    # and window_aggregate(skew_mitigation=...) takes exactly that route
    via_api = window_aggregate(events, plan, skew_mitigation="salted")
    assert "__chunk" in via_api._jdf.queryExecution().optimizedPlan().toString()


def test_skew_mitigation_quiet_advisor_or_ineligible_stays_plain(spark, sf_dir):
    from window_aggregation_spark.operators.window_aggregation import (
        _salted_route,
    )

    li = read_table(spark, sf_dir, "lineitem")
    high = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("l_orderkey",), order_by=(OrderKey("l_linenumber"),)
        ),
        aggregates=(AggregateDef("rq", "accumulate", field="l_quantity"),),
    )
    # plentiful keys -> advisor quiet -> no routing
    assert _salted_route(li, high) is None
    # ineligible shapes (multi-key order / non-routable function) never
    # even reach the sampling job
    events = read_table(spark, sf_dir, "events")
    assert _salted_route(events, _events_plan()) is None  # two order keys
    rank_plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("event_type",), order_by=(OrderKey("ts"),)
        ),
        aggregates=(AggregateDef("rn", "row_number"),),
    )
    assert _salted_route(events, rank_plan) is None
    # mitigation-off on the hot shape: plain WindowExec, no chunk columns
    hot = events.withColumn("event_type", F.lit("only"))
    plain = window_aggregate(hot, _routable_plan())
    assert "__chunk" not in plain._jdf.queryExecution().optimizedPlan().toString()
    with pytest.raises(ValueError, match="skew_mitigation"):
        window_aggregate(hot, _routable_plan(), skew_mitigation="bogus")


def test_window_aggregate_advise_flag_warns_and_still_computes(spark, sf_dir):
    # the test session runs local[4] (conftest): a ONE-key partition column
    # sits below that parallelism no matter the fixture's key counts
    events = read_table(spark, sf_dir, "events").withColumn(
        "event_type", F.lit("only")
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = window_aggregate(events, _events_plan(), advise_skew=True)
        n = out.count()
    assert n == events.count()
    assert any("salted_running_agg" in str(x.message) for x in w)
    # default build: no warning, no sampling job
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        window_aggregate(events, _events_plan())
    assert not [x for x in w if "salted" in str(x.message)]


def test_salted_route_preserves_column_order_and_samples_once(spark, sf_dir):
    """Two contract properties of the routed path (r6 review findings):

    1. With no declared_schema the routed output must have EXACTLY the
       plain path's columns in the plain path's order (input fields in
       input order, then appended aliases) — salted_running_agg's join
       would otherwise float the join keys to the front, making the
       result schema depend on whether routing fired.
    2. advise_skew=True + skew_mitigation='salted' must run the advisor's
       sampling job ONCE, not once for the warning and once for the route.
    """
    from unittest.mock import patch

    from window_aggregation_spark.operators.window_aggregation import (
        _salted_route,
    )
    from window_aggregation_spark.plans import advisor

    events = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value", "ts")
        .withColumn("event_type", F.lit("only"))
    )
    plan = _routable_plan()
    plain = window_aggregate(events, plan)
    routed = _salted_route(events, plan)
    assert routed is not None
    assert routed.columns == plain.columns

    calls = {"n": 0}
    real = advisor.skew_hints

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    with patch.object(advisor, "skew_hints", side_effect=counted):
        with pytest.warns(UserWarning):
            out = window_aggregate(
                events, plan, advise_skew=True, skew_mitigation="salted"
            )
    assert calls["n"] == 1
    assert "__chunk" in out._jdf.queryExecution().optimizedPlan().toString()
    assert out.columns == plain.columns
