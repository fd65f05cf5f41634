"""Distributed graph operators over edge lists: connected components (the
grouping step that turns near-duplicate PAIRS into duplicate CLUSTERS)
and fixed-iteration PageRank (node importance for link/citation-style
corpora).

Greedy pairwise dedup (drop the higher id of every pair) is not transitive:
a~b and b~c with a!~c can keep both a and c. Components fix that: every
node gets the minimum reachable node id as its cluster label, and one
representative per cluster survives.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — pure DataFrame
self-joins and aggregations, no graph library:

- ``large-star``: every node points its larger neighbors at its smallest
  neighbor-or-self.
- ``small-star``: every node and its smaller neighbors all point at the
  smallest of them.

Both steps strictly reduce the potential function and converge to star
graphs rooted at each component's minimum in O(log n) rounds (label
propagation needs O(diameter) rounds AND drags a full label table through
every join — stars rewire the edge set itself, so hub-and-spoke dup
clusters converge in 1-2 rounds).

Scale notes: per round, two shuffles (a groupBy min and a self-join per
star step) over the EDGE set — which for LSH dup pairs is far smaller than
the corpus. Lineage is truncated every round with ``localCheckpoint``
(iterative plans otherwise grow exponentially and stall Catalyst); on a
real cluster with executor churn, set a reliable ``checkpoint_dir``
(``spark.sparkContext.setCheckpointDir``) and pass ``reliable=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    nb = _symmetric(e)
    mins = (
        nb.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .withColumn("m", F.least("__mn", "u"))
        .select("u", "m")
    )
    return (
        nb.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    pointed = oriented.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        pointed.union(self_edges)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _fingerprint(e: DataFrame) -> tuple:
    # Order-independent edge-set digest: one aggregate, no sort, no collect.
    # bit_xor (not sum) — xor never overflows a long under ANSI mode, and the
    # edge set is distinct so duplicate cancellation can't occur.
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Component label per node: ``(node, component)`` where ``component``
    is the minimum node id reachable from ``node``. Only nodes appearing in
    ``pairs`` are returned — callers map absent nodes to themselves.

    ``reliable=True`` uses ``checkpoint()`` (requires a checkpoint dir) for
    lineage truncation instead of ``localCheckpoint()``; use it on clusters
    where executor loss must not kill the job.
    """
    e = (
        pairs.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    def _truncate(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
            eager=True
        )

    e = _truncate(e)
    prev = _fingerprint(e)
    for _ in range(max_iter):
        last_e = e
        e = _truncate(_small_star(_large_star(e)))
        # free the superseded checkpoint's blocks — an iterative loop
        # that pins every round's RDD leaks storage memory linearly in
        # iterations (and starves long test sessions / real clusters)
        last_e.unpersist()
        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pathological graph? raise max_iter)"
        )

    # Converged edge set is a star forest oriented child -> root.
    children = e.select(
        F.greatest("u", "v").alias("node"), F.least("u", "v").alias("component")
    )
    roots = children.select(
        F.col("component").alias("node"), F.col("component")
    ).distinct()
    return children.union(roots).distinct()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 3,
    damping: float = 0.85,
    reliable: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list: ``(node, rank)``
    for every node appearing as a source or destination.

    Semantics (the original power-iteration formula, no dangling-mass
    redistribution — dangling nodes keep only the teleport term, which is
    the common MapReduce convention and keeps the result a pure function
    of the edge set):

        rank_0(v)   = 1 / N
        rank_i+1(v) = (1 - d)/N + d * sum over in-neighbors u of
                      rank_i(u) / outdeg(u)

    Fixed ``iterations`` (not convergence-tested) keeps the result
    deterministic and SQL-mirrorable; pass more iterations for better
    convergence (each costs two shuffles).

    Scale shape: edge weights ``1/outdeg`` are computed ONCE and
    checkpointed — per iteration the plan is one join of the rank table
    (N rows) onto the weighted edges (shuffle on src) and one groupBy dst
    (second shuffle); the rank table is checkpointed per iteration so the
    plan never grows. The single driver action is the bounded node
    count N (a scalar, needed for the teleport constant).
    """
    def _truncate(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
            eager=True
        )

    e = (
        edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        )
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes = _truncate(nodes)
    n = nodes.count()
    if n == 0:
        # empty edge set -> empty result, not a ZeroDivisionError from
        # the teleport constant
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg"))
    # reciprocal precomputed once (multiply beats divide in the per-
    # iteration hot path, and the 1/outdeg form is what the DuckDB
    # oracle mirrors op-for-op for bit-level comparability)
    w = _truncate(
        e.join(deg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("__outdeg")).alias("w")
        )
    )
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            w.join(ranks, w["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("__c"))
        )
        last_ranks = ranks
        ranks = _truncate(
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if i > 0:
            # superseded iteration checkpoints leak storage linearly —
            # free them (i == 0 is the un-checkpointed init projection)
            last_ranks.unpersist()
    return ranks
