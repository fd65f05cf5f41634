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
- **pair search**: bucket-grouped double explode keyed on
  ``(cluster_id, sub_bucket)`` with ``id_a < id_b`` and an
  expression-:func:`~.dedup.cosine` threshold — each bucket is a local
  cartesian, so per-task cost is bounded by the largest bucket. A
  pathological hot cluster (half the corpus in one centroid) is guarded
  automatically: clusters over ``max_cluster_size`` are re-bucketed
  in-cluster by fixed hyperplane sign bits (``hot_nbits``), so the
  degenerate mass splits into ``2^hot_nbits`` bounded tasks instead of
  one OOM-ing collect_list.

Approximation is inherited from clustering: a true near-dup pair split
across two clusters is missed. Recall vs the exact all-pairs path is
regression-tested (``tests/test_semantic.py``), the same bar the LSH
variants are held to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    # Per-row fold over literal centroids (same shape as the IVF expr
    # assignment, r5): the bounded codebook is collected once, each row
    # scores all centroids with the oracle-reproducible left-to-right
    # cosine fold, and `sort_array desc` over (sim, -idx) structs yields
    # "sim desc, centroid index asc" — zero shuffles and zero row
    # explosion vs the old crossJoin + per-id ranking window.
    cent_rows = (
        rows.where(F.col("v").isNotNull())
        .orderBy("id")
        .limit(n_clusters)
        .collect()
    )
    if not cent_rows:
        # empty / all-null input: no codebook -> no assignments (the old
        # crossJoin shape returned empty too; F.array() of zero struct
        # branches would be VOID-typed and fail analysis)
        return rows.withColumn("cluster_id", F.lit(0)).where(F.lit(False))
    scored = F.array(*[
        F.struct(
            cosine(
                F.col("v"),
                F.array(*[F.lit(float(x)) for x in r["v"]])
                .cast("array<float>"),
            ).alias("s"),
            F.lit(-i).alias("negidx"),
        )
        for i, r in enumerate(cent_rows)
    ])
    top = F.slice(F.sort_array(scored, asc=False), 1, probes)
    return rows.select(
        "id",
        "v",
        F.explode(
            F.transform(top, lambda t: (-t["negidx"]).cast("int"))
        ).alias("cluster_id"),
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
    hot_nbits: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: ``(id_a, id_b, cos_sim)`` with
    ``id_a < id_b`` and ``round(cos, 4) >= threshold`` (distinct — with
    ``probes`` > 1 a pair can co-occur in several probed clusters). The
    rounded expression-level cosine is emitted (not the BLAS value), so
    results are engine-reproducible.

    Pair generation is bucket-grouping + double explode, NOT a self-join
    on ``cluster_id``: a self-join computes the whole assignment pipeline
    (broadcast matmul or literal-fold projection) TWICE and shuffles it
    twice — Spark does not common-subexpression join branches (same
    reasoning as the minhash candidate stage). ``collect_list``
    materializes one cluster per task, so a hot cluster is the known
    failure mode — and it is guarded AUTOMATICALLY: clusters whose
    assignment count exceeds ``max_cluster_size`` are re-bucketed
    in-cluster by ``hot_nbits`` fixed hyperplane sign bits (the
    :func:`~.similarity.hyperplane_buckets` LSH), bounding per-task
    members near ``hot/2^hot_nbits`` while small clusters keep exact
    within-cluster comparison. Hot-cluster pairs split across hyperplane
    sub-buckets are missed — the same approximation contract as
    :func:`.dedup.embedding_dup_pairs`, and strictly better than the
    pre-r5 behavior (oversized clusters were dropped wholesale). The
    guard costs one extra column-pruned assignment pass for the
    per-cluster counts (a map-side-combined groupBy — skew-safe);
    ``max_cluster_size=None`` disables it and that pass entirely.

    Embeddings are assumed UNIFORM-DIMENSION (as any one corpus's are):
    the hot-cluster hyperplanes are sized from ``dim`` when given, else
    from a one-row driver probe of the first non-null vector at
    construction time. Pass ``dim`` explicitly to skip that probe (the
    right call in a serving pipeline where the dim is known); rows whose
    vectors disagree with it raise inside hot clusters via the
    hyperplane guard rather than silently mis-bucketing."""
    assigned = cluster_assign(
        df,
        id_col,
        vec_col,
        n_clusters=n_clusters,
        probes=probes,
        assign=assign,
        kmeans_iters=kmeans_iters,
    )
    if max_cluster_size is not None:
        from window_aggregation_spark.operators.similarity import (
            hyperplane_buckets,
        )

        sizes = assigned.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("__csz")
        )
        if dim is None:
            # one bounded driver action to size the hyperplanes (first
            # NON-NULL vector — a leading null row must not zero the dim);
            # construction-time eagerness is confined to this one row
            # fetch and skipped entirely when the caller passes dim.
            dim_row = df.where(F.col(vec_col).isNotNull()).select(
                F.size(F.col(vec_col)).alias("d")
            ).first()
            dim = int(dim_row["d"]) if dim_row and dim_row["d"] else 0
        assigned = (
            assigned.join(F.broadcast(sizes), "cluster_id")
            .withColumn(
                "__sub",
                F.when(
                    F.col("__csz") > max_cluster_size,
                    hyperplane_buckets(vec_col="v", nbits=hot_nbits, dim=dim),
                ).otherwise(F.lit(0)),
            )
            .drop("__csz")
        )
    else:
        assigned = assigned.withColumn("__sub", F.lit(0))
    buckets = assigned.groupBy("cluster_id", "__sub").agg(
        F.collect_list(F.struct("id", "v")).alias("__m")
    )
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
