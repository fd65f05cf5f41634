"""Unit tests for operators/lm.py — unigram-LM perplexity scoring.

The suite-level DuckDB differential (test_suite_oracle) covers the
self-trained path on the parquet fixtures; these tests pin the semantics a
SQL oracle can't reach as easily: the pretrained-counts/OOV path, empty
documents, the band filter, and the materialized two-scan plan shape.
Python floats round half-even (Spark/DuckDB round half-up), so the
brute-force reference compares unrounded values with an absolute
tolerance instead of bit equality.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from window_aggregation_spark.operators import lm

TOK = re.compile(r"[a-z0-9]+")


def _py_perplexity(texts: dict[int, str], train: dict[int, str] | None = None,
                   add_k: float = 1.0) -> dict[int, tuple[int, float | None]]:
    """Unrounded reference: (n_tokens, perplexity) per doc."""
    train = train if train is not None else texts
    vocab: Counter[str] = Counter()
    for t in train.values():
        vocab.update(TOK.findall(t.lower()))
    c_total = sum(vocab.values())
    v = len(vocab)
    denom = c_total + add_k * v

    out: dict[int, tuple[int, float | None]] = {}
    for doc_id, t in texts.items():
        toks = TOK.findall(t.lower())
        if not toks:
            out[doc_id] = (0, None)
            continue
        s = 0.0
        for tok, tf in sorted(Counter(toks).items()):
            p = (vocab.get(tok, 0) + add_k) / denom
            s += tf * math.log(p)
        out[doc_id] = (len(toks), math.exp(-s / len(toks)))
    return out


def _docs_df(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )


def test_self_trained_matches_reference(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "a cat and a dog and a mat",
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["perplexity"])
        for r in lm.perplexity_unigram(_docs_df(spark, texts)).collect()
    }
    want = _py_perplexity(texts)
    assert set(got) == set(want)
    for doc_id, (n, ppl) in want.items():
        assert got[doc_id][0] == n
        assert math.isclose(got[doc_id][1], ppl, abs_tol=1e-4)


def test_empty_document_keeps_row_with_null_metrics(spark):
    texts = {1: "alpha beta alpha", 2: "", 3: "!!! ???"}
    rows = {r["doc_id"]: r
            for r in lm.perplexity_unigram(_docs_df(spark, texts)).collect()}
    assert set(rows) == {1, 2, 3}
    for empty_id in (2, 3):
        assert rows[empty_id]["n_tokens"] == 0
        assert rows[empty_id]["avg_nll"] is None
        assert rows[empty_id]["perplexity"] is None
    assert rows[1]["perplexity"] is not None


def test_pretrained_counts_scores_oov_at_smoothed_floor(spark):
    train = {10: "red green blue red green", 11: "red blue"}
    score = {1: "red green", 2: "purple purple"}  # purple is OOV
    counts = lm.unigram_counts(_docs_df(spark, train))
    got = {
        r["doc_id"]: (r["n_tokens"], r["perplexity"])
        for r in lm.perplexity_unigram(
            _docs_df(spark, score), counts=counts
        ).collect()
    }
    want = _py_perplexity(score, train=train)
    for doc_id, (n, ppl) in want.items():
        assert got[doc_id][0] == n
        assert math.isclose(got[doc_id][1], ppl, abs_tol=1e-4)
    # OOV-only doc must be strictly more perplexing than the in-vocab doc
    assert got[2][1] > got[1][1]


def test_unigram_counts_values(spark):
    counts = {
        r["token"]: r["cnt"]
        for r in lm.unigram_counts(
            _docs_df(spark, {1: "a b a", 2: "b c"})
        ).collect()
    }
    assert counts == {"a": 2, "b": 2, "c": 1}


def test_band_filter_keeps_only_in_band(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "a cat and a dog and a mat",
        4: "",
    }
    scored = lm.perplexity_unigram(_docs_df(spark, texts))
    ppls = {r["doc_id"]: r["perplexity"] for r in scored.collect()
            if r["perplexity"] is not None}
    lo = min(ppls.values())
    hi = sorted(ppls.values())[len(ppls) // 2]
    kept = lm.perplexity_band_filter(_docs_df(spark, texts), lo, hi)
    got_ids = {r["doc_id"] for r in kept.collect()}
    want_ids = {i for i, p in ppls.items() if lo <= p <= hi}
    assert got_ids == want_ids
    assert 4 not in got_ids  # empty doc (NULL perplexity) always dropped


def _py_bigram_perplexity(
    texts: dict[int, str], train: dict[int, str] | None = None,
    add_k: float = 1.0,
) -> dict[int, tuple[int, float | None]]:
    """Unrounded bigram reference: (n_transitions, perplexity) per doc."""
    train = train if train is not None else texts
    uni: Counter[str] = Counter()
    bi: Counter[str] = Counter()
    for t in train.values():
        toks = TOK.findall(t.lower())
        uni.update(toks)
        bi.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    v = len(uni)

    out: dict[int, tuple[int, float | None]] = {}
    for doc_id, t in texts.items():
        toks = TOK.findall(t.lower())
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not bgs:
            out[doc_id] = (0, None)
            continue
        s = 0.0
        for bg, tf in sorted(Counter(bgs).items()):
            prefix = bg.split(" ")[0]
            p = (bi.get(bg, 0) + add_k) / (uni.get(prefix, 0) + add_k * v)
            s += tf * math.log(p)
        out[doc_id] = (len(bgs), math.exp(-s / len(bgs)))
    return out


def test_bigram_matches_reference(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "a cat and a dog and a mat",
    }
    got = {
        r["doc_id"]: (r["n_transitions"], r["perplexity"])
        for r in lm.perplexity_bigram(_docs_df(spark, texts)).collect()
    }
    want = _py_bigram_perplexity(texts)
    assert set(got) == set(want)
    for doc_id, (n, ppl) in want.items():
        assert got[doc_id][0] == n
        assert math.isclose(got[doc_id][1], ppl, abs_tol=1e-4)


def test_bigram_short_docs_get_null_metrics(spark):
    texts = {1: "solo", 2: "", 3: "two tokens"}
    rows = {r["doc_id"]: r
            for r in lm.perplexity_bigram(_docs_df(spark, texts)).collect()}
    assert rows[1]["n_transitions"] == 0 and rows[1]["perplexity"] is None
    assert rows[2]["n_transitions"] == 0 and rows[2]["perplexity"] is None
    assert rows[3]["n_transitions"] == 1 and rows[3]["perplexity"] is not None


def test_bigram_pretrained_counts_with_oov(spark):
    train = {10: "red green blue red green blue", 11: "red blue red"}
    score = {1: "red green blue", 2: "purple red zig zag"}
    tdf = _docs_df(spark, train)
    counts = (lm.bigram_counts(tdf), lm.unigram_counts(tdf))
    got = {
        r["doc_id"]: (r["n_transitions"], r["perplexity"])
        for r in lm.perplexity_bigram(
            _docs_df(spark, score), counts=counts
        ).collect()
    }
    want = _py_bigram_perplexity(score, train=train)
    for doc_id, (n, ppl) in want.items():
        assert got[doc_id][0] == n
        assert math.isclose(got[doc_id][1], ppl, abs_tol=1e-4)
    assert got[2][1] > got[1][1]


def test_materialized_plan_scans_corpus_twice_only(spark, sf_dir):
    from window_aggregation_spark.sources.io import read_table

    # suite-order robustness: an earlier test's cached/persisted corpus
    # frame turns the FileScans this test pins into InMemory scans
    spark.catalog.clearCache()
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    out = lm.perplexity_unigram(docs, keep_cols=("lang", "source"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_scans = len(re.findall(r"FileScan", plan))
    assert n_scans <= 2, f"expected <=2 corpus scans, got {n_scans}"
    assert "CartesianProduct" not in plan
    # the spine scan must be column-pruned: no text column read there
    spine_scans = [ln for ln in plan.splitlines()
                   if "FileScan" in ln and "text" not in ln]
    assert spine_scans, "no pruned spine scan found"
