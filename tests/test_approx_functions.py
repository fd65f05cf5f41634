"""Sketch-based scale variants: approximate results must track exact ones."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark import (
    AggregateDef,
    OrderKey,
    WindowPlan,
    WindowSpecDef,
    window_aggregate,
)
from window_aggregation_spark.sources.io import read_table


def test_approx_discrete_percentile_tracks_exact(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem")
    spec = WindowSpecDef(
        partition_by=("l_returnflag",), order_by=(OrderKey("l_quantity"),)
    )
    plan = WindowPlan(
        spec=spec,
        aggregates=(
            AggregateDef("exact_p", "discrete_percentile",
                         field="l_quantity", args=("0.5",)),
            AggregateDef("approx_p", "approx_discrete_percentile",
                         field="l_quantity", args=("0.5",)),
        ),
        declared_schema=("l_orderkey", "l_linenumber", "l_returnflag",
                         "l_quantity", "exact_p", "approx_p"),
    )
    out = window_aggregate(df, plan)
    bad = out.where(
        F.abs(F.col("exact_p") - F.col("approx_p")) > F.col("exact_p") * 0.05 + 1.0
    ).count()
    assert bad == 0, f"{bad} rows where approx percentile drifts >5%"


def test_approx_count_distinct_window(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("l_returnflag",)),
        aggregates=(
            AggregateDef("apx_parts", "approx_count_distinct", field="l_partkey"),
        ),
        declared_schema=("l_orderkey", "l_linenumber", "l_returnflag", "apx_parts"),
    )
    out = window_aggregate(df, plan)
    exact = {
        r["l_returnflag"]: r["n"]
        for r in df.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    got = {
        r["l_returnflag"]: r["apx_parts"]
        for r in out.select("l_returnflag", "apx_parts").distinct().collect()
    }
    for k, approx in got.items():
        assert approx == pytest.approx(exact[k], rel=0.1)
