"""Fuzzy join: variant-generation algebra, completeness vs the brute-
force definition (the SymSpell deletion-blocking theorem, differentially
tested), duplicate-key payload re-attachment, and input validation."""

import random

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators.fuzzy_join import (
    deletion_variants,
    fuzzy_join,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_deletion_variants_exact_sets(spark):
    row = spark.range(1).select(
        deletion_variants(F.lit("abc"), 1).alias("d1"),
        deletion_variants(F.lit("abc"), 2).alias("d2"),
        deletion_variants(F.lit(""), 1).alias("empty"),
        deletion_variants(F.lit("aa"), 1).alias("dupes"),
    ).first()
    assert sorted(row.d1) == sorted(["abc", "bc", "ac", "ab"])
    assert sorted(row.d2) == sorted(
        ["abc", "bc", "ac", "ab", "c", "b", "a"]
    )
    assert row.empty == [""]
    assert sorted(row.dupes) == ["a", "aa"]  # deduplicated


def test_deletion_variants_bounds():
    with pytest.raises(ValueError, match=">= 0"):
        deletion_variants(F.lit("x"), -1)
    with pytest.raises(ValueError, match="unsupported"):
        deletion_variants(F.lit("x"), 3)


@pytest.mark.parametrize("d", [0, 1, 2])
def test_matches_bruteforce_definition(spark, d):
    """Every pair within levenshtein distance d is found (blocking is
    complete) and nothing beyond it survives (verify is exact)."""
    rng = random.Random(42 + d)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(0, 6)))
        for _ in range(120)
    ]
    left = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words[:60])], "lid int, lk string"
    )
    right = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words[60:])], "rid int, rk string"
    )
    got = {
        (r.lid, r.rid, r.distance)
        for r in fuzzy_join(
            left, right, "lk", "rk", max_distance=d
        ).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in enumerate(words[:60])
        for j, b in enumerate(words[60:])
        if _lev(a, b) <= d
    }
    assert got == want


def test_duplicate_keys_reattach_all_rows(spark):
    """Verification runs per distinct string pair, but every payload row
    combination must come back."""
    left = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "xyz")], "lid int, lk string"
    )
    right = spark.createDataFrame(
        [(10, "abd"), (11, "abd")], "rid int, rk string"
    )
    got = sorted(
        (r.lid, r.rid) for r in
        fuzzy_join(left, right, "lk", "rk", max_distance=1).collect()
    )
    assert got == [(1, 10), (1, 11), (2, 10), (2, 11)]


def test_null_keys_never_match(spark):
    left = spark.createDataFrame([(1, None), (2, "ab")], "lid int, lk string")
    right = spark.createDataFrame([(3, None), (4, "ab")], "rid int, rk string")
    got = fuzzy_join(left, right, "lk", "rk", max_distance=2).collect()
    assert [(r.lid, r.rid, r.distance) for r in got] == [(2, 4, 0)]


def test_column_collision_and_distance_col(spark):
    df1 = spark.createDataFrame([(1, "a")], "k int, s string")
    with pytest.raises(ValueError, match="both sides"):
        fuzzy_join(df1, df1, "s", "s")
    df2 = spark.createDataFrame([(1, "a")], "k2 int, distance string")
    with pytest.raises(ValueError, match="already exists"):
        fuzzy_join(df1, df2, "s", "distance")


def test_long_key_raises_in_plan(spark):
    left = spark.createDataFrame([(1, "x" * 300)], "lid int, lk string")
    right = spark.createDataFrame([(2, "x")], "rid int, rk string")
    with pytest.raises(Exception, match="max_key_length"):
        fuzzy_join(
            left, right, "lk", "rk", max_key_length=128
        ).collect()


def test_plan_stays_jvm_side(spark):
    left = spark.createDataFrame([(1, "abc")], "lid int, lk string")
    right = spark.createDataFrame([(2, "abd")], "rid int, rk string")
    plan = (
        fuzzy_join(left, right, "lk", "rk")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
