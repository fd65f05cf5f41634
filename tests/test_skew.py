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


def test_salted_avg_bit_equals_plain_window(spark, sf_dir):
    """avg decomposes over (sum, count); on integral-valued doubles
    (l_quantity) both the chunked and the plain path sum exactly, so the
    single final division must make the results BIT-equal — not just
    tolerance-close."""
    from window_aggregation_spark.operators.skew import salted_running_agg

    df = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    plain = df.withColumn("expected", F.avg("l_quantity").over(w))
    salted = salted_running_agg(
        df, ["l_returnflag"], "l_quantity", "l_quantity",
        agg="avg", chunks=16, alias="got",
    )
    joined = plain.join(
        salted,
        on=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
    )
    assert joined.where(F.col("expected") != F.col("got")).count() == 0


@pytest.mark.parametrize("agg", ["stddev", "var_samp"])
def test_salted_stddev_bit_equals_power_sum_window(spark, sf_dir, agg):
    """stddev/var_samp decompose over power sums (Σx, Σx², n). The plain
    comparison target is the SAME power-sum expression over a plain
    window (the engine's reproducible formulation, as used by the
    two-field moments) — integral-valued inputs make every sum exact, so
    equality must be bit-level regardless of chunking."""
    from window_aggregation_spark.operators.skew import salted_running_agg

    df = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    v = F.col("l_quantity").cast("double")
    s = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    n = F.count("l_quantity").over(w)
    var = F.when(n > 1, F.greatest(F.lit(0.0), (s2 - s * s / n) / (n - 1)))
    plain = df.withColumn(
        "expected", F.sqrt(var) if agg == "stddev" else var
    )
    salted = salted_running_agg(
        df, ["l_returnflag"], "l_quantity", "l_quantity",
        agg=agg, chunks=16, alias="got",
    )
    joined = plain.join(
        salted,
        on=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
    )
    assert joined.where(F.col("expected") != F.col("got")).count() == 0


def test_salted_composite_null_and_single_row_frames(spark):
    """A null-only group must yield null avg/stddev everywhere; a 1-row
    frame must yield null stddev (sample semantics) but a real avg."""
    from window_aggregation_spark.operators.skew import salted_running_agg

    df = spark.createDataFrame(
        [(0, "a", 1.0, 4.0), (1, "a", 2.0, 6.0),
         (2, "b", 1.0, None), (3, "b", 2.0, None)],
        "id int, k string, o double, v double",
    )
    out = salted_running_agg(
        df, ["k"], "o", "v", agg="avg", chunks=4, alias="a"
    )
    out = salted_running_agg(
        out, ["k"], "o", "v", agg="stddev", chunks=4, alias="sd"
    )
    rows = {r["id"]: (r["a"], r["sd"]) for r in out.collect()}
    assert rows[0] == (4.0, None)  # 1-row frame: avg yes, stddev_samp null
    assert rows[1] == (5.0, 2.0 ** 0.5)
    assert rows[2] == (None, None)  # null-only group stays null
    assert rows[3] == (None, None)


def test_salted_handles_constant_order_column(spark):
    # degenerate sketch: all boundaries equal -> single chunk, still correct
    df = spark.createDataFrame(
        [(i, "k", 1.0, 2.0) for i in range(10)], "id int, k string, o double, v double"
    )
    out = salted_running_sum(df, ["k"], "o", "v", chunks=8)
    vals = {r["run_sum"] for r in out.collect()}
    assert vals == {20.0}  # all rows are peers -> full-partition sum for each


# ---------------------------------------------------------------------------
# salted equi-join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join_on_hot_key(spark):
    """90% of the fact side under ONE key — the motivating shape. The
    salted result must be the exact multiset of the plain join."""
    from window_aggregation_spark.operators.skew import salted_join

    fact = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.createDataFrame(
        [(7, "hot"), (950, "cold"), (999, "cold2"), (12345, "unmatched")],
        "k long, label string",
    )
    got = sorted(
        (r["k"], r["fact_id"], r["label"])
        for r in salted_join(fact, dim, ["k"], salts=4).collect()
    )
    want = sorted(
        (r["k"], r["fact_id"], r["label"])
        for r in fact.join(dim, on="k").collect()
    )
    assert got == want
    assert len(got) == 902  # 900 hot + 2 cold


def test_salted_left_join_keeps_unmatched_fact_rows(spark):
    from window_aggregation_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "k long, fact_id long"
    )
    dim = spark.createDataFrame([(1, "a")], "k long, label string")
    got = {
        (r["k"], r["fact_id"], r["label"])
        for r in salted_join(fact, dim, ["k"], salts=3, how="left").collect()
    }
    assert got == {(1, 10, "a"), (1, 11, "a"), (2, 20, None)}


def test_salted_join_duplicate_fact_rows_join_once_each(spark):
    """Identical fact rows share a salt; each row instance must still pair
    exactly once with each matching dim row (multiset semantics)."""
    from window_aggregation_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, 5), (1, 5), (1, 5)], "k long, v long")
    dim = spark.createDataFrame([(1, "x"), (1, "y")], "k long, label string")
    out = salted_join(fact, dim, ["k"], salts=4)
    assert out.count() == 6  # 3 fact instances x 2 dim rows


def test_salted_join_rejects_bad_args(spark):
    from window_aggregation_spark.operators.skew import salted_join

    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="full")
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], salts=0)


def test_precomputed_boundaries_reused_and_arbitrary_ok(spark, sf_dir):
    """chunk_boundaries computed once must feed repeated salted calls with
    results identical to per-call approxQuantile — and because boundaries
    only balance chunk sizes, even a deliberately terrible boundary list
    (all mass in one chunk) stays exactly correct."""
    from window_aggregation_spark.operators.skew import (
        chunk_boundaries,
        salted_running_agg,
    )

    df = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    bounds = chunk_boundaries(df, "l_quantity", chunks=16)
    assert len(bounds) == 15
    key = ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]
    fresh = salted_running_agg(
        df, ["l_returnflag"], "l_quantity", "l_quantity",
        agg="sum", chunks=16,
    )
    for reused_bounds in (bounds, [-1e18, 0.0]):  # good and terrible
        reused = salted_running_agg(
            df, ["l_returnflag"], "l_quantity", "l_quantity",
            agg="sum", boundaries=reused_bounds,
        )
        joined = fresh.withColumnRenamed("run_agg", "a").join(
            reused.withColumnRenamed("run_agg", "b"), on=key
        )
        bad = joined.where(
            F.abs(F.col("a") - F.col("b")) > F.abs(F.col("a")) * 1e-9
        ).count()
        assert bad == 0
