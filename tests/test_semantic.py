"""SemDeDup-style semantic dedup: numpy and expression assignment agree,
within-cluster pair search recalls the exact all-pairs result, survivors
follow the greedy keep-lowest rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators.dedup import cosine
from window_aggregation_spark.operators.semantic import (
    cluster_assign,
    semantic_dedup,
    semantic_dup_pairs,
)
from window_aggregation_spark.sources.io import read_table


@pytest.fixture(scope="module", autouse=True)
def _codegen_on(spark):
    """This module's tests are COMPUTE-heavy (real probe workloads /
    vector math), where whole-stage codegen pays for its compile cost —
    measured 2x slower interpreted for the CC scale probe (8.9 -> 19.3 s)
    when r14 turned codegen off session-wide for the tiny-plan majority.
    Flip it back on for this module only (runtime-settable conf)."""
    key = "spark.sql.codegen.wholeStage"
    before = spark.conf.get(key)
    spark.conf.set(key, "true")
    yield
    spark.conf.set(key, before)


THRESH = 0.45


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def _exact_pairs(emb, threshold):
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(cosine(F.col("va"), F.col("vb")), 4) >= threshold)
        .collect()
    }


def test_numpy_and_expr_assignment_agree(spark, emb):
    """The broadcast-matmul (scale) and expression (oracle) assignments
    must produce the same (id, cluster) set — argmax over the same
    centroids, ties to the lowest index in both."""
    kw = dict(n_clusters=8, probes=2)
    got_np = {
        (r["id"], r["cluster_id"])
        for r in cluster_assign(emb, assign="numpy", **kw).collect()
    }
    got_ex = {
        (r["id"], r["cluster_id"])
        for r in cluster_assign(emb, assign="expr", **kw).collect()
    }
    assert got_np == got_ex


def test_pair_recall_vs_exact(spark, emb):
    want = _exact_pairs(emb, THRESH)
    assert want, "fixture must contain near-dup pairs at this threshold"
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            emb, n_clusters=8, probes=3, threshold=THRESH, assign="expr"
        ).collect()
    }
    assert got <= want  # no false positives: every pair is cosine-verified
    assert len(got) >= 0.7 * len(want)  # recall bar, same as LSH variants


def test_semantic_dedup_drops_pair_losers(spark, emb):
    pairs = semantic_dup_pairs(
        emb, n_clusters=8, probes=3, threshold=THRESH, assign="expr"
    )
    losers = {r["id_b"] for r in pairs.collect()}
    survivors = {
        r["vec_id"]
        for r in semantic_dedup(
            emb, n_clusters=8, probes=3, threshold=THRESH, assign="expr"
        ).collect()
    }
    total = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert survivors == total - losers


def test_kmeans_iters_rejected_for_expr(spark, emb):
    with pytest.raises(ValueError):
        cluster_assign(emb, assign="expr", kmeans_iters=2)
    with pytest.raises(ValueError):
        cluster_assign(emb, assign="nope")


def test_hot_cluster_guard_bounds_tasks_and_keeps_pairs(spark, emb):
    """Degenerate hot cluster (>50% of mass in one centroid — here forced
    by a tiny max_cluster_size): the guard re-buckets oversized clusters
    by hyperplane sign bits, so (a) per-task member lists stay bounded,
    (b) hot-cluster pairs are still FOUND (pre-r5 they were dropped
    wholesale), and (c) small clusters keep exact within-cluster search."""
    from window_aggregation_spark.operators.similarity import (
        hyperplane_buckets,
    )

    n = emb.count()
    cap = max(4, n // 10)  # with n_clusters=2 both clusters are "hot"
    guarded = semantic_dup_pairs(
        emb, n_clusters=2, probes=1, threshold=THRESH,
        assign="expr", max_cluster_size=cap, hot_nbits=3,
    )
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    # pre-r5 behavior: every cluster over the cap dropped -> zero pairs
    assert got, "hot-cluster guard must keep (approximate) pairs, not drop"
    # every surviving pair is a true near-dup (no garbage from sub-bucketing)
    exact = _exact_pairs(emb, THRESH)
    assert got <= exact
    # the per-task bound: recompute the guard's grouping keys and check
    # the largest (cluster, sub_bucket) member list
    assigned = cluster_assign(emb, n_clusters=2, probes=1, assign="expr")
    sub = assigned.withColumn(
        "__sub", hyperplane_buckets(vec_col="v", nbits=3, dim=64)
    )
    max_bucket = (
        sub.groupBy("cluster_id", "__sub").count()
        .agg(F.max("count").alias("m")).first()["m"]
    )
    assert max_bucket < n / 2, "sub-bucketing failed to split the hot mass"


def test_hot_cluster_guard_noop_below_cap(spark, emb):
    """With the default (large) cap no cluster is hot: results must be
    IDENTICAL to the unguarded path — the suite oracle depends on it."""
    base = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in semantic_dup_pairs(
            emb, n_clusters=8, probes=3, threshold=THRESH,
            assign="expr", max_cluster_size=None,
        ).collect()
    }
    guarded = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in semantic_dup_pairs(
            emb, n_clusters=8, probes=3, threshold=THRESH,
            assign="expr",
        ).collect()
    }
    assert guarded == base


def test_expr_assignment_handles_empty_and_null_inputs(spark):
    """Empty or all-null-vector inputs must yield an empty assignment
    (the literal-fold rewrite would otherwise build a VOID-typed array
    and fail analysis — r5 review regression)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cluster_assign(empty, assign="expr").count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>"
    )
    assert cluster_assign(nulls, assign="expr").count() == 0
