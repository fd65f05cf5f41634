"""Range (interval) join: bucketed equi-join decomposition — semantics
(half-open containment, boundary-spanning intervals, equi-keys, left join)
and the plan guarantee (no BroadcastNestedLoopJoin / CartesianProduct)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators.range_join import range_join


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),
            (2, "u1", "2024-01-01 10:59:59.999999"),
            (3, "u1", "2024-01-01 11:00:00"),  # == interval end: excluded
            (4, "u2", "2024-01-01 10:30:00"),
            (5, "u1", "2024-01-03 00:00:00"),  # matches nothing
        ],
        "event_id long, user_id string, ts_s string",
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))


@pytest.fixture(scope="module")
def intervals(spark):
    return spark.createDataFrame(
        [
            (100, "u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
            # spans many 1-hour buckets; must still match each point once
            (200, "u2", "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
            # degenerate (start == end): matches nothing
            (300, "u1", "2024-01-01 10:00:00", "2024-01-01 10:00:00"),
        ],
        "ival_id long, ikey string, s_s string, e_s string",
    ).select(
        "ival_id",
        "ikey",
        F.to_timestamp("s_s").alias("win_start"),
        F.to_timestamp("e_s").alias("win_end"),
    )


def test_half_open_containment_no_keys(spark, points, intervals):
    out = range_join(
        points, intervals.drop("ikey"), "ts", "win_start", "win_end",
        bucket="1 hour",
    )
    pairs = {(r["event_id"], r["ival_id"]) for r in out.collect()}
    # point 1 at interval 100's start: included; point 3 at its end:
    # excluded (half-open) — but 3 is strictly inside the day-long 200;
    # the degenerate 300 matches nothing; point 5 is outside everything
    assert pairs == {
        (1, 100), (2, 100), (4, 100),
        (1, 200), (2, 200), (3, 200), (4, 200),
    }


def test_boundary_spanning_interval_matches_exactly_once(spark, points, intervals):
    """The 24h interval overlaps 24 one-hour buckets; each contained point
    must appear exactly once (no dedup pass exists to hide double joins)."""
    out = range_join(
        points, intervals.drop("ikey").where("ival_id = 200"),
        "ts", "win_start", "win_end", bucket="1 hour",
    )
    rows = [r["event_id"] for r in out.collect()]
    assert sorted(rows) == [1, 2, 3, 4]  # each once


def test_equi_keys_restrict_matches(spark, points, intervals):
    iv = intervals.withColumnRenamed("ikey", "user_id")
    out = range_join(
        points, iv, "ts", "win_start", "win_end",
        keys=["user_id"], bucket="30 minutes",
    )
    pairs = {(r["event_id"], r["ival_id"]) for r in out.collect()}
    assert pairs == {(1, 100), (2, 100), (4, 200)}


def test_left_join_keeps_unmatched_points(spark, points, intervals):
    iv = intervals.withColumnRenamed("ikey", "user_id")
    out = range_join(
        points, iv, "ts", "win_start", "win_end",
        keys=["user_id"], bucket="1 hour", how="left",
    )
    got = {r["event_id"]: r["ival_id"] for r in out.collect()}
    assert got[3] is None and got[5] is None
    assert out.count() == 5
    with pytest.raises(ValueError):
        range_join(points, iv, "ts", "win_start", "win_end", how="full")


def test_plan_has_no_nested_loop_or_cartesian(spark, points, intervals):
    out = range_join(
        points, intervals.drop("ikey"), "ts", "win_start", "win_end",
        bucket="1 hour",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
