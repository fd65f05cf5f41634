"""Bloom-filter join reduction: parameter math, exactness vs the plain
join, actual probe-side volume reduction, degenerate inputs, and the
budget guard."""

import math

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators.bloom_join import (
    BloomFilter,
    bloom_join,
    bloom_parameters,
    bloom_prefilter,
    build_bloom_filter,
)


def test_bloom_parameters_textbook():
    m, k = bloom_parameters(1000, 0.01)
    # -1000 ln(.01)/ln(2)^2 = 9585.1 -> 9586 -> round to 64
    assert m % 64 == 0 and 9585 <= m <= 9586 + 63
    assert k == round(m / 1000 * math.log(2))
    with pytest.raises(ValueError):
        bloom_parameters(0, 0.01)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


def test_no_false_negatives_and_volume(spark):
    """Every real member passes the pre-filter (bloom invariant), and the
    filter actually cuts a probe whose keys are mostly non-members."""
    small = spark.range(500).selectExpr("id * 97 as k")  # sparse keys
    big = spark.range(50_000).selectExpr("id as k")
    bf = build_bloom_filter(small, "k", expected_items=500, fpp=0.01)
    pre = bloom_prefilter(big, bf, "k")
    kept = {r.k for r in pre.collect()}
    members = {r.k for r in small.collect() if r.k < 50_000}
    assert members <= kept, "bloom filter dropped a real member"
    # ~516 members in range + ~1% fpp of 50k misses ~ 500 extras
    assert len(kept) < 5_000, f"no real reduction: kept {len(kept)}"


def test_join_equals_plain_join(spark):
    li = spark.range(20_000).selectExpr(
        "id % 700 as k", "id as row_id", "id * 2 as v"
    )
    dim = spark.range(100).selectExpr("id * 7 as k", "id as dim_v")
    got = bloom_join(li, dim, "k").orderBy("row_id").collect()
    want = li.join(dim, "k").orderBy("row_id").collect()
    assert got == want


def test_left_semi_and_rejected_how(spark):
    li = spark.range(1_000).selectExpr("id % 50 as k", "id as row_id")
    dim = spark.range(10).selectExpr("id * 5 as k")
    got = bloom_join(li, dim, "k", how="left_semi").orderBy("row_id").collect()
    want = li.join(dim, "k", "left_semi").orderBy("row_id").collect()
    assert got == want
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_join(li, dim, "k", how="left")


def test_empty_build_side(spark):
    """An empty build side yields an all-zero filter: every probe row is
    rejected by the bit tests and the join is empty — not a crash."""
    big = spark.range(100).selectExpr("id as k")
    empty = big.where("k < 0")
    bf = build_bloom_filter(empty, "k", expected_items=1, fpp=0.01)
    assert all(w == 0 for w in bf.words)
    assert bloom_prefilter(big, bf, "k").count() == 0
    assert bloom_join(big, empty, "k").count() == 0


def test_duplicate_build_keys_equivalent(spark):
    """OR is idempotent: duplicates on the build side produce the exact
    same filter as distinct keys (no distinct pre-shuffle needed)."""
    keys = spark.range(200).selectExpr("id % 40 as k")
    bf_dup = build_bloom_filter(keys, "k", expected_items=40, fpp=0.01)
    bf_dis = build_bloom_filter(
        keys.distinct(), "k", expected_items=40, fpp=0.01
    )
    assert bf_dup == bf_dis


def test_string_keys(spark):
    li = spark.range(5_000).selectExpr(
        "concat('u', cast(id % 300 as string)) as k", "id as row_id"
    )
    dim = spark.range(20).selectExpr("concat('u', cast(id * 15 as string)) as k")
    got = bloom_join(li, dim, "k").orderBy("row_id").collect()
    want = li.join(dim, "k").orderBy("row_id").collect()
    assert got == want


def test_budget_guard():
    with pytest.raises(ValueError, match="max_filter_bytes"):
        bloom_parameters_over = 10**9
        build_bloom_filter(
            None,  # never touched: the guard fires before any Spark work
            "k",
            expected_items=bloom_parameters_over,
            fpp=0.001,
            max_filter_bytes=1024,
        )


def test_mismatched_key_types_rejected(spark):
    """An equi-join would coerce '5' = 5L; the hash pre-filter cannot —
    mismatched key dtypes must raise, not silently drop matches."""
    big = spark.range(10).selectExpr("cast(id as string) as k")
    dim = spark.range(3).selectExpr("id as k")
    with pytest.raises(ValueError, match="different types"):
        bloom_join(big, dim, "k")


def test_reserved_probe_columns_rejected(spark):
    big = spark.range(10).selectExpr("id as k", "id as __pos0")
    dim = spark.range(3).selectExpr("id as k")
    bf = build_bloom_filter(dim, "k", expected_items=3, fpp=0.01)
    with pytest.raises(ValueError, match="reserved"):
        bloom_prefilter(big, bf, "k")


def test_probe_filter_is_codegen(spark):
    """The probe-side pre-filter must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython in the plan, and the bloom ships as a broadcast."""
    big = spark.range(1_000).selectExpr("id as k")
    dim = spark.range(10).selectExpr("id * 3 as k")
    plan = bloom_join(big, dim, "k")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Broadcast" in plan
