"""Bucketed tables: a join between two tables bucketed on the join key must
plan with NO shuffle exchange — the physical layout co-locates the keys."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.sources.io import read_table, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, no_broadcast):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    try:
        write_bucketed(
            li.select("l_orderkey", "l_quantity"), "li_b", ["l_orderkey"],
            num_buckets=8,
        )
        write_bucketed(
            orders.select("o_orderkey", "o_totalprice"), "ord_b", ["o_orderkey"],
            num_buckets=8,
        )
        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        # and an unbucketed baseline DOES shuffle
        base = li.select("l_orderkey", "l_quantity").join(
            orders.select("o_orderkey", "o_totalprice"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        base_plan = base._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in base_plan
        assert joined.count() == base.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
