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


def test_fluent_sql_validates_before_render(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, k string, v double")
    with pytest.raises(ValidationError, match="takes only 1 argument"):
        window(df).partition_by("k").order_by("id").sql(
            "t", AggregateDef("x", "lead", field="v", args=())
        )
