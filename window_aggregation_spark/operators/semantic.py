"""SemDeDup-style semantic deduplication: cluster embeddings, then find
near-duplicate pairs only *within* clusters.

Extension scope (SURVEY §2.5). Where :func:`.dedup.embedding_dup_pairs`
buckets by random hyperplanes, semantic dedup buckets by *data-dependent*
k-means-style clusters (Abbas et al., "SemDeDup", arXiv:2303.09540): near
duplicates are overwhelmingly co-assigned to the same centroid, so the
pair search is restricted to cluster-local comparisons — |corpus|²/k
instead of |corpus|² at uniform cluster sizes.

Scale shape:

- **assignment** (``assign="numpy"``, the 100 TB path): centroids are a
  bounded driver-side sample (optionally Lloyd-refined, fully
  distributed), broadcast once; each partition block-matmuls its vectors
  against the centroid matrix via ``mapInPandas`` — no shuffle, no row
  explosion.
- **assignment** (``assign="expr"``, the oracle path): broadcast cross
  join against the ≤``n_clusters`` centroid rows + expression-level
  cosine + one ``row_number`` — every arithmetic step reproducible in any
  SQL engine, which is what makes the suite query value-checkable.
- **pair search**: equi-join on ``cluster_id`` (one hash shuffle per
  side) with ``id_a < id_b`` and an expression-:func:`~.dedup.cosine`
  threshold — each cluster is a local cartesian, so per-task cost is
  bounded by the largest cluster. A pathological hot cluster (half the
  corpus in one centroid) is the known failure mode: raise ``n_clusters``
  or run :func:`.dedup.embedding_dup_pairs` *within* the hot cluster —
  both leave this operator's contract unchanged.

Approximation is inherited from clustering: a true near-dup pair split
across two clusters is missed. Recall vs the exact all-pairs path is
regression-tested (``tests/test_semantic.py``), the same bar the LSH
variants are held to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from window_aggregation_spark.operators.dedup import cosine


def cluster_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_clusters: int = 16,
    probes: int = 1,
    assign: str = "numpy",
    kmeans_iters: int = 0,
) -> DataFrame:
    """(id, vector, cluster_id) — nearest-centroid assignment; with
    ``probes`` > 1 each vector is assigned to its ``probes`` nearest
    centroids (one output row per assignment), the IVF-nprobe trick that
    buys pair recall at the cluster boundary for ``probes``x join input.

    Centroids are the first ``n_clusters`` vectors by id (deterministic;
    ``kmeans_iters`` > 0 Lloyd-refines them distributedly — numpy mode
    only, the refined centroids are no longer expressible as a SQL
    subquery).
    """
    rows = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if assign == "numpy":
        from window_aggregation_spark.operators.similarity import (
            _assign_lists_fn,
            _kmeans_centroids,
            _sample_centroids,
        )

        cents = (
            _kmeans_centroids(rows, n_clusters, kmeans_iters)
            if kmeans_iters > 0
            else _sample_centroids(rows, n_clusters)
        )
        b = df.sparkSession.sparkContext.broadcast(cents)
        out = rows.mapInPandas(
            _assign_lists_fn(b, probes),
            schema="id long, v array<float>, list_id int",
        ).withColumnRenamed("list_id", "cluster_id")
        return out
    if assign != "expr":
        raise ValueError(f"cluster_assign: unknown assign={assign!r}")
    if kmeans_iters:
        raise ValueError("cluster_assign: kmeans_iters requires assign='numpy'")
    cents = (
        rows.orderBy("id")
        .limit(n_clusters)
        .select(F.col("id").alias("__cent_id"), F.col("v").alias("__cent_v"))
        .withColumn(
            "__cidx",
            F.row_number().over(Window.orderBy(F.col("__cent_id").asc())) - 1,
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("__sim").desc(), F.col("__cidx").asc()
    )
    return (
        rows.crossJoin(F.broadcast(cents))
        .withColumn("__sim", cosine(F.col("v"), F.col("__cent_v")))
        .withColumn("__arank", F.row_number().over(w))
        .where(F.col("__arank") <= probes)
        .select("id", "v", F.col("__cidx").cast("int").alias("cluster_id"))
    )


def semantic_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_clusters: int = 16,
    probes: int = 1,
    threshold: float = 0.9,
    assign: str = "numpy",
    kmeans_iters: int = 0,
    max_cluster_size: int | None = 100_000,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: ``(id_a, id_b, cos_sim)`` with
    ``id_a < id_b`` and ``round(cos, 4) >= threshold`` (distinct — with
    ``probes`` > 1 a pair can co-occur in several probed clusters). The
    rounded expression-level cosine is emitted (not the BLAS value), so
    results are engine-reproducible.

    Pair generation is bucket-grouping + double explode, NOT a self-join
    on ``cluster_id``: a self-join computes the whole assignment pipeline
    (broadcast matmul or crossJoin+window) TWICE and shuffles it twice —
    Spark does not common-subexpression join branches (same reasoning as
    the minhash candidate stage). ``collect_list`` materializes one
    cluster per task, so ``max_cluster_size`` caps the degenerate-cluster
    blowup (a capped cluster's pairs are skipped — raise ``n_clusters``
    or sub-bucket with :func:`.dedup.embedding_dup_pairs` if that
    happens on real data)."""
    assigned = cluster_assign(
        df,
        id_col,
        vec_col,
        n_clusters=n_clusters,
        probes=probes,
        assign=assign,
        kmeans_iters=kmeans_iters,
    )
    buckets = assigned.groupBy("cluster_id").agg(
        F.collect_list(F.struct("id", "v")).alias("__m")
    )
    if max_cluster_size is not None:
        buckets = buckets.where(F.size("__m") <= max_cluster_size)
    return (
        buckets.where(F.size("__m") >= 2)
        .select(F.explode("__m").alias("__a"), F.col("__m"))
        .select("__a", F.explode("__m").alias("__b"))
        .where(F.col("__a.id") < F.col("__b.id"))
        .withColumn(
            "cos_sim",
            F.round(cosine(F.col("__a.v"), F.col("__b.v")), 4),
        )
        .where(F.col("cos_sim") >= threshold)
        .select(
            F.col("__a.id").alias("id_a"),
            F.col("__b.id").alias("id_b"),
            "cos_sim",
        )
        .distinct()
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_clusters: int = 16,
    probes: int = 1,
    threshold: float = 0.9,
    assign: str = "numpy",
    kmeans_iters: int = 0,
) -> DataFrame:
    """Survivors after dropping the higher id of every within-cluster dup
    pair (the same greedy keep-lowest rule as ``minhash_dedup``; for
    transitive-closure grouping chain the pair set through
    ``graph.connected_components`` instead)."""
    pairs = semantic_dup_pairs(
        df,
        id_col,
        vec_col,
        n_clusters=n_clusters,
        probes=probes,
        threshold=threshold,
        assign=assign,
        kmeans_iters=kmeans_iters,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")
