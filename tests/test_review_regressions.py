"""Regression tests for defects found in review: dual-backend type parity,
simhash recall contract, sub-second session gaps, tiebreak typing, LSH dim
guard, parser bound errors, fluent-SQL validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark import ValidationError, config_to_plan, window_aggregate
from window_aggregation_spark.api import lead, window
from window_aggregation_spark.operators import dedup as dd
from window_aggregation_spark.operators.asof_join import asof_join
from window_aggregation_spark.operators.similarity import ann_lsh_topk
from window_aggregation_spark.plans.sql_gen import plan_to_sql
from window_aggregation_spark.spec import AggregateDef, OrderKey, WindowPlan, WindowSpecDef
from window_aggregation_spark.streaming.window_stream import sessionize


def test_sql_backend_casts_accumulate_to_input_type(spark):
    """SQL backend must apply the same input-type passthrough cast as the
    DataFrame backend (sum over INT stays INT, not BIGINT)."""
    df = spark.createDataFrame([(1, "a", 5), (2, "a", 7)], "id int, k string, v int")
    plan = WindowPlan(
        spec=WindowSpecDef(partition_by=("k",), order_by=(OrderKey("id"),)),
        aggregates=(AggregateDef("s", "accumulate", field="v"),),
    )
    api_out = window_aggregate(df, plan)
    df.createOrReplaceTempView("cast_parity")
    sql = plan_to_sql(plan, "cast_parity", df.columns, input_types=dict(df.dtypes))
    sql_out = spark.sql(sql)
    assert dict(api_out.dtypes)["s"] == "int"
    assert dict(sql_out.dtypes)["s"] == "int"
    assert api_out.schema == sql_out.schema


def test_simhash_pigeonhole_guarantees_max_hamming(spark):
    """Pairs within max_hamming MUST be found even when the differing bits
    are spread so that every 16-bit quarter differs (the old 4-chunk split
    missed them for max_hamming > 3)."""
    # Build two token sets whose simhashes differ in exactly k spread bits is
    # hard to stage directly; instead verify exhaustively against brute force.
    rows = [(i, " ".join(f"tok{j}" for j in range(i % 7 + 3))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash(df, "doc_id").collect()}
    for max_h in (4, 8):
        expected = {
            (a, b)
            for a in sh
            for b in sh
            if a < b and bin((sh[a] ^ sh[b]) & (2**64 - 1)).count("1") <= max_h
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in dd.simhash_dedup_pairs(df, "doc_id", max_hamming=max_h).collect()
        }
        assert got == expected, f"max_hamming={max_h}: {expected ^ got}"


def test_sessionize_subsecond_gap_boundary(spark):
    """Gap comparison must use full timestamp precision: 1799.8s is within a
    30-minute gap even when the second-truncated difference is 1800."""
    df = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00.900"),
            (2, 100, "2024-01-01 00:30:00.700"),  # 1799.8s later -> same session
            (3, 100, "2024-01-01 01:00:01.000"),  # 1800.3s later -> new session
        ],
        "event_id long, user_id long, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap="30 minutes").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2}


def test_asof_string_tiebreak_is_deterministic(spark):
    left = spark.createDataFrame(
        [(1, 5, "2024-01-01 10:00:00")], "lid long, k long, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    right = spark.createDataFrame(
        [("aa", 5, "2024-01-01 09:00:00", 1.0), ("zz", 5, "2024-01-01 09:00:00", 2.0)],
        "rid string, k long, ts_s string, v double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    for _ in range(3):
        (row,) = asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rid", "v"],
            tiebreak="rid",
        ).collect()
        assert (row["rid"], row["v"]) == ("zz", 2.0)  # lexicographically latest


def test_lsh_dim_mismatch_raises(spark):
    emb = spark.createDataFrame(
        [(1, [0.1] * 32), (2, [0.2] * 32)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="expected dim=64"):
        ann_lsh_topk(emb, emb, k=1, nbits=4).collect()


def test_parser_collects_bad_bounds_and_partitions():
    with pytest.raises(ValidationError) as exc:
        config_to_plan(
            partition_fields="k",
            partition_order="v:Ascending",
            window_frame_type="ROW",
            preceding="two",
            following="3.5",
            number_of_partitions="many",
            aggregates="s:accumulate(v,,true)",
        )
    msgs = " ".join(f.message for f in exc.value.failures)
    assert "'preceding' bound 'two'" in msgs
    assert "'following' bound '3.5'" in msgs
    assert "'numberOfPartitions' 'many'" in msgs


def test_nth_value_unbounded_following_frame(spark):
    """nth_value over [CURRENT ROW, UNBOUNDED FOLLOWING] must read the n-th
    value from the frame START (forward order) — the O(n^2)-escape reversal
    rewrite must not apply to order-sensitive nth_value (round-1 advice:
    reversal returned the n-th value from the wrong end)."""
    from window_aggregation_spark.spec import (
        UNBOUNDED_FOLLOWING,
        FrameType,
    )

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(5)], "id int, k string, v double"
    )
    plan = WindowPlan(
        spec=WindowSpecDef(
            partition_by=("k",),
            order_by=(OrderKey("id"),),
            frame_type=FrameType.ROW,
            start=0,
            end=UNBOUNDED_FOLLOWING,
        ),
        aggregates=(AggregateDef("n2", "nth_value", field="v", args=("2",)),),
    )
    out = {r["id"]: r["n2"] for r in window_aggregate(df, plan).collect()}
    # frame of row i is rows i..4; its 2nd value is v[i+1], null at the tail
    assert out == {0: 1.0, 1: 2.0, 2: 3.0, 3: 4.0, 4: None}
    # ... and the reversal must still fire when nth_value is absent alongside
    # a swap pair (first <-> last equivalence under reversal)
    plan_fl = WindowPlan(
        spec=plan.spec,
        aggregates=(
            AggregateDef("f", "first", field="v", ignore_nulls=False),
            AggregateDef("l", "last", field="v", ignore_nulls=False),
        ),
    )
    fl = {r["id"]: (r["f"], r["l"]) for r in window_aggregate(df, plan_fl).collect()}
    assert fl == {i: (float(i), 4.0) for i in range(5)}


def test_nth_value_sql_backend_ignore_nulls_parity(spark):
    """The SQL renderer must emit IGNORE NULLS exactly when the DataFrame
    builder passes ignoreNulls (round-1 advice: API returned 10.0 where the
    generated SQL returned null)."""
    df = spark.createDataFrame(
        [(1, "g", None), (2, "g", 10.0), (3, "g", 20.0)],
        "id int, k string, v double",
    )
    df.createOrReplaceTempView("nth_parity")
    for ignore in (True, False):
        plan = WindowPlan(
            spec=WindowSpecDef(partition_by=("k",), order_by=(OrderKey("id"),)),
            aggregates=(
                AggregateDef(
                    "n1", "nth_value", field="v", args=("1",), ignore_nulls=ignore
                ),
            ),
        )
        api = window_aggregate(df, plan).orderBy("id").collect()
        sql = plan_to_sql(plan, "nth_parity", df.columns, dialect="spark")
        via_sql = spark.sql(sql).orderBy("id").collect()
        assert api == via_sql, f"ignore_nulls={ignore}"
        expected_last = 10.0 if ignore else None  # running frame, first value
        assert api[-1]["n1"] == expected_last


def test_salted_sum_null_local_chunk(spark):
    """A chunk whose field values are all null so far must still surface the
    offset from earlier chunks (round-1 advice: expected 5.0, got null)."""
    from window_aggregation_spark.operators.skew import salted_running_agg

    # order values 1..6; values null except the first chunk's rows
    rows = [
        (1, "k", 1.0, 2.0),
        (2, "k", 2.0, 3.0),
        (3, "k", 10.0, None),
        (4, "k", 11.0, None),
        (5, "k", 20.0, None),
        (6, "k", 21.0, 4.0),
    ]
    df = spark.createDataFrame(rows, "id int, k string, o double, v double")
    out = salted_running_agg(
        df, ["k"], "o", "v", agg="sum", chunks=3, alias="rs"
    )
    got = {r["id"]: r["rs"] for r in out.collect()}
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    expected = {
        r["id"]: r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == expected
    assert got[4] == 5.0  # the reproduced case: null local, non-null offset


def test_all_null_key_stays_null_in_salted_sum(spark):
    """A key whose field is entirely null must produce null (not 0) in every
    row, matching the plain running sum."""
    from window_aggregation_spark.operators.skew import salted_running_agg

    df = spark.createDataFrame(
        [(i, "k", float(i), None) for i in range(6)],
        "id int, k string, o double, v double",
    )
    out = salted_running_agg(df, ["k"], "o", "v", agg="sum", chunks=3, alias="rs")
    assert [r["rs"] for r in out.collect()] == [None] * 6


def test_fluent_sql_validates_before_render(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, k string, v double")
    with pytest.raises(ValidationError, match="takes only 1 argument"):
        window(df).partition_by("k").order_by("id").sql(
            "t", AggregateDef("x", "lead", field="v", args=())
        )
