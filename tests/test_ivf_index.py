"""IVF index persistence: build-once/query-many must return exactly the
in-memory ivf_topk results, survive a cold load, and lay out inverted
lists as list_id-partitioned parquet so probes prune the scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.operators import similarity as sim
from window_aggregation_spark.sources.io import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["nn_rank"])
        for r in df.collect()
    )


def test_index_roundtrip_matches_in_memory(spark, emb, tmp_path):
    queries = emb.where(F.col("vec_id") < 8)
    corpus = emb.where(F.col("vec_id") >= 8)
    want = _rows(
        sim.ivf_topk(queries, corpus, k=5, n_centroids=16, nprobe=4)
    )

    path = str(tmp_path / "ivf")
    built = sim.build_ivf_index(corpus, path, n_centroids=16)
    got_built = _rows(
        sim.ivf_topk_index(queries, built, k=5, nprobe=4)
    )
    assert got_built == want

    # cold load from disk — nothing cached from the build
    loaded = sim.load_ivf_index(spark, path)
    got_loaded = _rows(sim.ivf_topk_index(queries, loaded, k=5, nprobe=4))
    assert got_loaded == want

    # pruning off must not change results (it only widens the scan)
    got_unpruned = _rows(
        sim.ivf_topk_index(queries, loaded, k=5, nprobe=4, prune_lists=False)
    )
    assert got_unpruned == want


def test_index_layout_is_list_partitioned(spark, emb, tmp_path):
    corpus = emb.where(F.col("vec_id") >= 8)
    path = str(tmp_path / "ivf_layout")
    idx = sim.build_ivf_index(corpus, path, n_centroids=8)
    part_dirs = [
        d for d in os.listdir(f"{path}/lists") if d.startswith("list_id=")
    ]
    assert part_dirs, "inverted lists must be partitioned by list_id"
    # every corpus vector lands in exactly one list
    assert idx.lists.count() == corpus.count()
    n_cent = spark.read.parquet(f"{path}/centroids").count()
    assert n_cent == 8
    assert idx.centroids.shape[0] == 8


def test_kmeans_index_roundtrip(spark, emb, tmp_path):
    """k-means codebooks persist too — the refined centroids are stored, so
    a cold load reproduces the build-time assignment exactly."""
    queries = emb.where(F.col("vec_id") < 8)
    corpus = emb.where(F.col("vec_id") >= 8)
    path = str(tmp_path / "ivf_km")
    built = sim.build_ivf_index(
        corpus, path, n_centroids=8, centroids="kmeans", kmeans_iters=2
    )
    loaded = sim.load_ivf_index(spark, path)
    assert _rows(sim.ivf_topk_index(queries, built, k=3, nprobe=3)) == _rows(
        sim.ivf_topk_index(queries, loaded, k=3, nprobe=3)
    )
