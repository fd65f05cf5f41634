"""Unit tests for operators/linalg.py — covariance / PCA / projection.

The suite-level DuckDB differential covers covariance_cells on the
fixture embeddings; these pin the math against numpy on controlled data,
PCA determinism/orthonormality, the pure-expression projection, and the
declared-dimension validation.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from window_aggregation_spark.operators import linalg


def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        ["vec_id", "embedding"],
    )


def _rand(n=60, d=6, seed=7):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)) @ np.diag([3, 2, 1, 0.5, 0.25, 0.1])


def test_covariance_matches_numpy(spark):
    mat = _rand()
    got = linalg.covariance_cells(_emb_df(spark, mat), scale=8).collect()
    ref = np.cov(mat, rowvar=False, bias=True)
    assert len(got) == mat.shape[1] ** 2
    for r in got:
        assert math.isclose(r["cov"], ref[r["i"], r["j"]], abs_tol=1e-6)


def test_covariance_is_symmetric(spark):
    mat = _rand(n=40)
    got = {(r["i"], r["j"]): r["cov"]
           for r in linalg.covariance_cells(
               _emb_df(spark, mat), scale=8).collect()}
    d = int(math.isqrt(len(got)))
    for i in range(d):
        for j in range(d):
            assert got[(i, j)] == got[(j, i)]


def test_declared_dim_mismatch_raises(spark):
    from pyspark.errors.exceptions.base import PySparkException

    df = _emb_df(spark, _rand(n=10, d=6))
    with pytest.raises(PySparkException, match="dim 6 != declared 5"):
        linalg.covariance_cells(df, dim=5).collect()


def test_pca_k_exceeding_dim_raises(spark):
    df = _emb_df(spark, _rand(n=10, d=6))
    with pytest.raises(ValueError, match="exceeds embedding dimension"):
        linalg.pca_components(df, k=7)


def test_pca_empty_corpus_raises(spark):
    empty = _emb_df(spark, _rand(n=1)).where("vec_id < 0")
    with pytest.raises(ValueError, match="empty corpus"):
        linalg.pca_components(empty, k=1)


def test_pca_components_orthonormal_and_ordered(spark):
    mat = _rand(n=200)
    comps = linalg.pca_components(_emb_df(spark, mat), k=3)
    vals = [v for v, _ in comps]
    assert vals == sorted(vals, reverse=True)
    w = np.array([c for _, c in comps])
    assert np.abs(w @ w.T - np.eye(3)).max() < 1e-9
    # sign convention: largest-|entry| coordinate is positive
    for _, c in comps:
        arr = np.array(c)
        assert arr[int(np.argmax(np.abs(arr)))] > 0
    # top eigenvalue should capture the dominant axis (scaled by 3)
    ref_vals = np.linalg.eigvalsh(np.cov(mat, rowvar=False, bias=True))
    assert math.isclose(vals[0], ref_vals[-1], rel_tol=1e-4)


def test_pca_project_matches_matrix_multiply(spark):
    mat = _rand(n=30)
    df = _emb_df(spark, mat)
    comps = linalg.pca_components(df, k=2)
    w = np.array([c for _, c in comps])
    rows = linalg.pca_project(df, comps).select("vec_id", "projected").collect()
    for r in rows:
        ref = w @ mat[r["vec_id"]]
        assert np.abs(np.array(r["projected"]) - ref).max() < 1e-9


def test_projection_preserves_variance_ordering(spark):
    mat = _rand(n=300)
    df = _emb_df(spark, mat)
    comps = linalg.pca_components(df, k=3)
    proj = np.array([
        r["projected"]
        for r in linalg.pca_project(df, comps).collect()
    ])
    variances = proj.var(axis=0)
    assert variances[0] >= variances[1] >= variances[2]


def test_pca_composes_with_ann_operators(spark, sf_dir):
    """The decorrelate-then-index pipeline: pca_project output feeds
    cosine_topk directly (schema-compatible), and because the fixture
    embeddings' variance is near-isotropic-plus-noise, a 16-of-64
    projection must keep top-1 self-similarity intact (a vector's
    nearest neighbor in projected space is itself)."""
    from window_aggregation_spark.operators.similarity import cosine_topk
    from window_aggregation_spark.sources.io import read_table

    emb = read_table(spark, sf_dir, "embeddings").limit(40)
    comps = linalg.pca_components(emb, k=16)
    proj = linalg.pca_project(emb, comps, out_col="embedding_pca")
    proj = proj.select("vec_id", F.col("embedding_pca").alias("embedding"))
    top1 = cosine_topk(proj.limit(8), proj, k=1)
    rows = top1.collect()
    assert len(rows) == 8
    for r in rows:
        assert r["query_id"] == r["neighbor_id"], rows


def test_projection_plan_is_pure_expressions(spark):
    df = _emb_df(spark, _rand(n=20))
    comps = linalg.pca_components(df, k=2)
    out = linalg.pca_project(df, comps)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
