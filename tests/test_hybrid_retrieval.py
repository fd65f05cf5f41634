"""Reciprocal-rank fusion: formula against a hand computation, absent-
list handling, input-order determinism of the fold, and the end-to-end
hybrid composition's containment properties."""

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators.search import (
    bm25_topk,
    hybrid_topk_rrf,
    rrf_fuse,
)
from window_aggregation_spark.operators.similarity import cosine_topk


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id string, rank int")


def test_rrf_hand_computed(spark):
    a = _ranked(spark, [("x", 1), ("y", 2), ("z", 3)])
    b = _ranked(spark, [("y", 1), ("w", 2)])
    got = {
        r.doc_id: (r.rank_1, r.rank_2, r.rrf_score)
        for r in rrf_fuse([a, b], k=10, k_rrf=60).collect()
    }
    want = {
        "x": (1, None, round(1.0 / 61, 6)),
        "y": (2, 1, round(1.0 / 62 + 1.0 / 61, 6)),
        "z": (3, None, round(1.0 / 63, 6)),
        "w": (None, 2, round(1.0 / 62, 6)),
    }
    assert got == want
    # y leads (in both lists), then the rank-1/rank-2 singletons
    order = [
        r.doc_id for r in rrf_fuse([a, b], k=10, k_rrf=60).collect()
    ]
    assert order[0] == "y"


def test_rrf_k_and_ties(spark):
    a = _ranked(spark, [("b", 1), ("a", 2)])
    b = _ranked(spark, [("a", 1), ("b", 2)])
    rows = rrf_fuse([a, b], k=1, k_rrf=60).collect()
    # identical scores -> tie broken by id ascending
    assert [r.doc_id for r in rows] == ["a"]


def test_rrf_empty_inputs_raise():
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_rrf_three_lists(spark):
    dfs = [
        _ranked(spark, [("x", 1)]),
        _ranked(spark, [("x", 2)]),
        _ranked(spark, [("x", 3), ("y", 1)]),
    ]
    got = {r.doc_id: r.rrf_score for r in rrf_fuse(dfs, k=5).collect()}
    assert got["x"] == round(1 / 61 + 1 / 62 + 1 / 63, 6)
    assert got["y"] == round(1 / 61, 6)


def test_hybrid_composition(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark hash join broadcast"),
            (1, "window partition frames"),
            (2, "hash join shuffle exchange"),
            (3, "cooking pasta tonight"),
        ],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [0.9, 0.1]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    qv = vecs.where("vec_id = 0")
    out = hybrid_topk_rrf(
        docs, vecs, "hash join", qv, k=4, n_candidates=3
    ).collect()
    # every fused doc is in at least one candidate list, with its rank
    lex_ids = {r.doc_id for r in bm25_topk(docs, "hash join", k=3).collect()}
    sem_ids = {
        r.neighbor_id
        for r in cosine_topk(qv, vecs, k=3).collect()
    }
    for r in out:
        assert r.doc_id in lex_ids | sem_ids
        assert (r.rank_1 is not None) == (r.doc_id in lex_ids)
        assert (r.rank_2 is not None) == (r.doc_id in sem_ids)
    # doc 0 tops both lists -> must rank first overall
    assert out[0].doc_id == 0
