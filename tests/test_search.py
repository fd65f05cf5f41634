"""Unit tests for operators/search.py — BM25 retrieval.

The suite-level DuckDB differential covers the fixture corpus; these pin
the formula against a brute-force Python reference on tiny controlled
corpora, edge cases (no-term query, no-match query, k truncation,
single/batch agreement), and the single-query plan shape (no corpus
shuffle: the scoring pass is a scan into TakeOrderedAndProject).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from window_aggregation_spark.operators import search

TOK = re.compile(r"[a-z0-9]+")


def _py_bm25(texts: dict[int, str], query: str, k1: float = 1.2,
             b: float = 0.75) -> dict[int, float]:
    """Unrounded BM25 reference (Lucene idf); score>0 docs only."""
    toks = {i: TOK.findall(t.lower()) for i, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(TOK.findall(query.lower())))
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        tf = Counter(v)
        s = 0.0
        for t in terms:
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf[t] * (k1 + 1.0)) / (
                tf[t] + k1 * (1 - b + b * len(v) / avgdl)
            )
        if s > 0:
            out[i] = s
    return out


CORPUS = {
    1: "spark shuffles data between executors",
    2: "the hash join broadcasts the small side",
    3: "window functions order rows within a partition",
    4: "a hash table backs the hash aggregate and the hash join",
    5: "sort merge join shuffles both sides",
}


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )


def test_scores_match_reference(spark):
    got = {r["doc_id"]: r["score"]
           for r in search.bm25_topk(_df(spark, CORPUS), "hash join",
                                     k=10).collect()}
    want = _py_bm25(CORPUS, "hash join")
    assert set(got) == set(want)
    for i, s in want.items():
        assert math.isclose(got[i], s, abs_tol=1e-4)
    # doc 4 (two 'hash join' hits, three 'hash') must outrank doc 5
    assert got[4] > got[5]


def test_topk_truncates_and_orders(spark):
    rows = search.bm25_topk(_df(spark, CORPUS), "join shuffles", k=2).collect()
    assert len(rows) == 2
    assert rows[0]["score"] >= rows[1]["score"]


def test_no_match_query_returns_empty(spark):
    assert search.bm25_topk(_df(spark, CORPUS), "zebra", k=5).count() == 0


def test_empty_query_raises(spark):
    with pytest.raises(ValueError):
        search.bm25_topk(_df(spark, CORPUS), "?!")


def test_batch_agrees_with_single(spark):
    queries = [("a", "hash join"), ("b", "window partition")]
    qdf = spark.createDataFrame(queries, ["query_id", "query_text"])
    batch = search.bm25_topk_batch(_df(spark, CORPUS), qdf, k=10).collect()
    by_q: dict[str, dict[int, float]] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    for qid, qtext in queries:
        single = {r["doc_id"]: r["score"]
                  for r in search.bm25_topk(_df(spark, CORPUS), qtext,
                                            k=10).collect()}
        assert by_q[qid] == single, qid


def test_batch_rank_is_dense_from_one(spark):
    qdf = spark.createDataFrame([("a", "join")], ["query_id", "query_text"])
    rows = sorted(
        search.bm25_topk_batch(_df(spark, CORPUS), qdf, k=3).collect(),
        key=lambda r: r["rn"],
    )
    assert [r["rn"] for r in rows] == list(range(1, len(rows) + 1))


def test_batch_termless_query_yields_no_rows(spark, duck):
    # contract (documented): a query with no indexable terms produces no
    # output rows in the batch path (single-query path raises instead)
    qdf = spark.createDataFrame(
        [("q_ok", "hash join"), ("q_bad", "?!")], ["query_id", "query_text"]
    )
    rows = search.bm25_topk_batch(_df(spark, CORPUS), qdf, k=5).collect()
    assert {r["query_id"] for r in rows} == {"q_ok"}


def test_batch_oracle_sql_escapes_quotes(duck):
    # must not be a syntax error; the apostrophe-bearing text tokenizes
    # to terms like 'don' and 't'
    sql = search.bm25_topk_batch_oracle_sql(
        [("q'1", "don't panic")], k=3, table="documents"
    )
    duck.sql(sql).df()  # raises on malformed SQL


def test_tfidf_keywords_match_reference(spark):
    got = [
        (r["doc_id"], r["token"], r["score"], r["rank"])
        for r in search.tfidf_keywords(_df(spark, CORPUS), m=2).collect()
    ]
    # brute-force reference
    toks = {i: TOK.findall(t.lower()) for i, t in CORPUS.items()}
    n = len(CORPUS)
    df_t: Counter[str] = Counter()
    for v in toks.values():
        df_t.update(set(v))
    want = []
    for i, v in sorted(toks.items()):
        scores = {
            t: c * (math.log(n / (1 + df_t[t])) + 1.0)
            for t, c in Counter(v).items()
        }
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for rank, (t, s) in enumerate(top, 1):
            want.append((i, t, s, rank))
    got_sorted = sorted(got)
    want_sorted = sorted(want)
    assert [(g[0], g[1], g[3]) for g in got_sorted] == [
        (w[0], w[1], w[3]) for w in want_sorted
    ]
    for g, w in zip(got_sorted, want_sorted):
        assert math.isclose(g[2], w[2], abs_tol=1e-4)


def test_tfidf_rank_respects_m(spark):
    rows = search.tfidf_keywords(_df(spark, CORPUS), m=3).collect()
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for doc_id, ranks in per_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), doc_id
        assert len(ranks) <= 3


def test_single_query_plan_has_no_corpus_shuffle(spark, sf_dir):
    from window_aggregation_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = search.bm25_topk(docs, "hash join spark", k=10)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # allowed exchanges: broadcasts and the stats aggregate's
    # SinglePartition reduce (bounded: one partial row per task);
    # NO hash-partitioned shuffle of corpus rows.
    assert "Exchange hashpartitioning" not in plan, plan
