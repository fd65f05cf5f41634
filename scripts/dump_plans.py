"""Regenerate PLANS.md: the physical-plan audit for EVERY suite query.

For each query: shuffle (Exchange) count, parquet scan count with pruned
ReadSchema widths, whole-stage-codegen span count, Python-eval operators
(should be only the deliberate Arrow ones), and broadcast vs sort-merge
joins — the things that decide whether a plan survives a 100x scale-up.
Run from the repo root: ``python scripts/dump_plans.py``.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from window_aggregation_spark.session import get_spark  # noqa: E402
from window_aggregation_spark.suite import SUITE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def audit(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        # toString renders codegen stages as "*(N) Operator" prefixes
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_ops": len(
            re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "nested_loop": len(re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan)),
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)>", plan),
    }


# Standing justifications for plan shapes that would otherwise read as
# anomalies in the table; rendered as their own section so they survive
# regeneration.
NOTES = {
    "graph_pagerank": (
        "shuffles/scans show 0 because every iteration's rank frame is "
        "localCheckpoint-ed (required: the per-iteration plan would "
        "otherwise grow without bound) and the dump sees only the final "
        "checkpointed RDD scan. Real per-iteration cost: one join of the "
        "rank table onto the checkpointed 1/outdeg edge weights (shuffle "
        "on src) + one groupBy dst — 2 exchanges per iteration, 3 "
        "iterations; superseded checkpoints are unpersisted as the loop "
        "advances (operators/graph.py::pagerank)."
    ),
    "sim_embedding_covariance": (
        "scans/python show 0 because the BLAS X'X partials frame is "
        "localCheckpoint-ed (computed once, consumed by four reduce "
        "branches) and the dump runs after materialization, which "
        "truncates lineage to an RDD scan. The real corpus cost is ONE "
        "mapInPandas pass (one FileScan + one MapInPandas before the "
        "checkpoint; verified in tests/test_linalg.py and the operator "
        "docstring); everything after it is partitions x d^2 rows."
    ),
    "text_perplexity_unigram": (
        "scans=1 is the pruned doc-id spine; the corpus text scan lives "
        "inside the localCheckpoint-ed (doc, token, tf) frame (computed "
        "once — without the checkpoint AQE left 8 corpus scans across "
        "the vocab/oov/score branches, measured in r6). Total corpus "
        "cost: 2 scans (tf pipeline + spine), pinned in tests/test_lm.py."
    ),
    "text_perplexity_bigram": (
        "same checkpoint-truncation as text_perplexity_unigram; the "
        "bigram tf frame and both count tables materialize once each."
    ),
    "corpus_take_n_stratum": (
        "heaviest-looking row for a 100-row result, deliberately: only ONE "
        "exchange touches the full corpus (the per-stratum count agg); the "
        "other shuffles rank/aggregate |strata|-row or ~safety*n-row sets. "
        "r6 merged the short+empty rescue branches into one left join "
        "(was 5 shuffles / 7 broadcasts in r5, now 4 / 5 with 3 reuses); "
        "the pre-prune exists because the plain single-window ranking "
        "shuffles and sorts the ENTIRE corpus through |strata| tasks — "
        "exactly the hot-stratum serialization the operator avoids."
    ),
    "dedup_minhash_lsh_stored": (
        "same logical result as dedup_minhash_lsh, but the signature scan "
        "reads the persisted (id, m0..m63) store instead of recomputing "
        "shingles+signatures from raw text — the raw-text scan that "
        "remains is the exact-Jaccard verify of candidate pairs only."
    ),
    "dedup_minhash_cc_stored": (
        "dedup_minhash_cc off the persisted signature store; with "
        "dedup_minhash_lsh_stored the LSH+CC family shares ONE signature "
        "pass per corpus instead of computing it per query."
    ),
    "dedup_sentence_spans_against": (
        "2 scans are the corpus (reduced to a distinct 8-byte hash set, "
        "broadcast into the window join) and the new batch — never a "
        "second corpus pass; the 2 exchanges are the distinct and the "
        "per-doc span merge (pinned in tests/test_plan_quality.py::"
        "test_incremental_span_dedup_plan_shapes)."
    ),
    "dedup_sentence_spans_stored": (
        "same shape as dedup_sentence_spans_against, but the corpus TEXT "
        "scan is gone: the corpus side reads the persisted "
        "SentenceHashStore parquet (ReadSchema is the bare __h:bigint) — "
        "the steady-state batch never rescans the corpus (VERDICT r11 "
        "#1; same plan pin as above)."
    ),
    "dedup_token_spans_stored": (
        "token-grain twin of dedup_sentence_spans_stored: the corpus "
        "side is the grain='token' span-hash parquet (bare __h scan); "
        "the verbatim-passage/decontamination check without a corpus "
        "rescan."
    ),
    "pipeline_c4_increment": (
        "the steady-state batch twin of pipeline_c4_clean: the corpus "
        "side is the persisted SentenceHashStore parquet (no corpus "
        "text scan — the batch-ingest span policy joins the broadcast "
        "8-byte hash set), and the c4+prune(auto) stages sit behind the "
        "same lazily-checkpointed batch intermediate."
    ),
    "pipeline_c4_clean": (
        "the prune stage runs strategy='auto' (r12): ONE plan-build-time "
        "driver count over the checkpointed frequent-line key set "
        "(already aggregated, never the corpus) picks array vs hash-join "
        "before the visible plan is constructed; the c4+prune stages sit "
        "behind the lazily-checkpointed pruned intermediate, so the "
        "visible plan stays the span stage's 3-exchange shape."
    ),
}


def main() -> None:
    # AQE off for the AUDIT only: the adaptive wrapper hides codegen spans
    # until runtime. The engine runs with AQE on; static counts here are
    # upper bounds (AQE may coalesce partitions / switch join strategies).
    spark = get_spark(
        "plan_audit",
        shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "# PLANS — physical-plan audit of every suite query",
        "",
        f"Generated by `python scripts/dump_plans.py` at sf_dir={SF_DIR}.",
        "",
        "Columns: hash-partition Exchanges (shuffles), reused exchanges,",
        "parquet scans, whole-stage-codegen spans, Python-eval operators",
        "(only deliberate Arrow/BLAS stages may appear), broadcast vs",
        "sort-merge joins, nested-loop/cartesian (0 everywhere except the",
        "deliberate bounded broadcasts: brute-force top-k, centroid",
        "assignment, the int8 coarse scan, and 1-row-aggregate count",
        "joins). `hl` marks bench.py headline queries. Iterative",
        "operators (CC, k-means) are audited on their final composed plan;",
        "their convergence loops are bounded by localCheckpoint lineage",
        "truncation, not visible in one static plan string.",
        "",
        "| query | hl | shuffles | reused | scans | codegen | python | bcast join | smj | nlj |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    details = []
    for name, q in sorted(SUITE.items()):
        df = q.build(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        lines.append(
            f"| {name} | {'*' if q.headline else ''} | "
            f"{a['exchanges']} | {a['reused_exchanges']} | "
            f"{a['scans']} | {a['codegen_spans']} | {a['python_ops']} | "
            f"{a['broadcast_joins']} | {a['sortmerge_joins']} | "
            f"{a['nested_loop']} |"
        )
        pruned = "; ".join(
            s[:100] + ("…" if len(s) > 100 else "") for s in a["read_schemas"]
        )
        details.append(f"- **{name}** — pruned scan schema(s): `{pruned or 'n/a'}`")
    lines += ["", "## Plan-shape notes", ""] + [
        f"- **{name}** — {text}" for name, text in sorted(NOTES.items())
    ]
    lines += ["", "## Scan pruning (ReadSchema reaching parquet)", ""] + details
    out = Path(__file__).resolve().parents[1] / "PLANS.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
