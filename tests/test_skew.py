"""Salted running sum must exactly equal the plain RANGE-frame running
window sum, for any chunk count, including ties on the order column."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from window_aggregation_spark.operators.skew import salted_running_sum
from window_aggregation_spark.sources.io import read_table


@pytest.mark.parametrize("chunks", [1, 4, 32])
def test_salted_equals_plain_running_sum(spark, sf_dir, chunks):
    df = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    plain = df.withColumn("expected", F.sum("l_quantity").over(w))
    salted = salted_running_sum(
        df, ["l_returnflag"], "l_quantity", "l_quantity", chunks=chunks
    )
    joined = plain.join(
        salted,
        on=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
    )
    mismatches = joined.where(F.col("expected") != F.col("run_sum")).count()
    assert mismatches == 0


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max"])
def test_salted_generalized_aggregates(spark, sf_dir, agg):
    from window_aggregation_spark.operators.skew import salted_running_agg

    df = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        "l_quantity", "l_extendedprice",
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    plain_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[agg]
    plain = df.withColumn("expected", plain_fn("l_extendedprice").over(w))
    salted = salted_running_agg(
        df, ["l_returnflag"], "l_quantity", "l_extendedprice",
        agg=agg, chunks=16, alias="got",
    )
    joined = plain.join(
        salted,
        on=["l_orderkey", "l_linenumber", "l_returnflag",
            "l_quantity", "l_extendedprice"],
    )
    # sum of doubles: chunked addition order differs from the single-pass
    # window, so compare within fp tolerance; others are exact
    if agg == "sum":
        bad = joined.where(
            F.abs(F.col("expected") - F.col("got"))
            > F.abs(F.col("expected")) * 1e-9
        ).count()
    else:
        bad = joined.where(F.col("expected") != F.col("got")).count()
    assert bad == 0


def test_salted_handles_constant_order_column(spark):
    # degenerate sketch: all boundaries equal -> single chunk, still correct
    df = spark.createDataFrame(
        [(i, "k", 1.0, 2.0) for i in range(10)], "id int, k string, o double, v double"
    )
    out = salted_running_sum(df, ["k"], "o", "v", chunks=8)
    vals = {r["run_sum"] for r in out.collect()}
    assert vals == {20.0}  # all rows are peers -> full-partition sum for each
