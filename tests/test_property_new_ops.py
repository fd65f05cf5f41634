"""Property tests for the round-3 operators: the bucketed range join must
equal the naive inequality join on arbitrary interval layouts, and
chunking must exactly tile arbitrary token streams."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import property_examples

from pyspark.sql import functions as F

from window_aggregation_spark.operators.corpus import chunk_documents
from window_aggregation_spark.operators.range_join import range_join

# one shared Spark session via the conftest fixture; hypothesis drives the
# data, Spark executes — keep examples small so each case is sub-second


@st.composite
def interval_case(draw):
    n_pts = draw(st.integers(1, 12))
    n_ivs = draw(st.integers(1, 8))
    pts = [draw(st.integers(0, 5000)) for _ in range(n_pts)]
    ivs = []
    for _ in range(n_ivs):
        s = draw(st.integers(0, 5000))
        ln = draw(st.integers(0, 2000))  # includes degenerate zero-length
        ivs.append((s, s + ln))
    bucket_s = draw(st.sampled_from([60, 3600, 86400]))
    return pts, ivs, bucket_s


@settings(max_examples=property_examples(12), deadline=None)
@given(interval_case())
def test_range_join_equals_naive_inequality_join(spark, case):
    pts, ivs, bucket_s = case
    points = spark.createDataFrame(
        [(i, s) for i, s in enumerate(pts)], "pid long, sec long"
    ).select("pid", F.timestamp_seconds("sec").alias("ts"))
    intervals = spark.createDataFrame(
        [(j, s, e) for j, (s, e) in enumerate(ivs)],
        "iid long, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds("s").alias("win_start"),
        F.timestamp_seconds("e").alias("win_end"),
    )
    bucket = {60: "1 minute", 3600: "1 hour", 86400: "1 day"}[bucket_s]
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, "ts", "win_start", "win_end", bucket=bucket
        ).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(pts)
        for j, (s, e) in enumerate(ivs)
        if s <= p < e
    }
    assert got == want


@settings(max_examples=property_examples(12), deadline=None)
@given(
    toks=st.lists(st.integers(0, 99), min_size=0, max_size=200),
    chunk=st.integers(2, 40),
    data=st.data(),
)
def test_chunking_tiles_any_token_stream(spark, toks, chunk, data):
    overlap = data.draw(st.integers(0, chunk - 1))
    text = " ".join(f"w{t}" for t in toks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, "doc_id", chunk_tokens=chunk, overlap=overlap
        ).collect()
    )
    if not toks:
        assert rows == []
        return
    stride = chunk - overlap
    rebuilt = list(rows[0][1].split(" "))
    for cid, ctext, n_tok in rows[1:]:
        ctoks = ctext.split(" ")
        assert rebuilt[cid * stride:] == ctoks[: len(rebuilt) - cid * stride]
        rebuilt.extend(ctoks[len(rebuilt) - cid * stride:])
    assert rebuilt == [f"w{t}" for t in toks]
    # every chunk's token count matches its text, and no chunk is empty
    for _, ctext, n_tok in rows:
        assert len(ctext.split(" ")) == n_tok


@st.composite
def asof_case(draw):
    n_l = draw(st.integers(1, 10))
    n_r = draw(st.integers(0, 10))
    lefts = [
        (i, draw(st.integers(0, 3)), draw(st.integers(0, 1000)))
        for i in range(n_l)
    ]
    rights = [
        (100 + i, draw(st.integers(0, 3)), draw(st.integers(0, 1000)))
        for i in range(n_r)
    ]
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    tol_s = draw(st.sampled_from([None, 60, 300]))
    return lefts, rights, direction, tol_s


@settings(max_examples=property_examples(14), deadline=None)
@given(asof_case())
def test_asof_equals_naive_per_row(spark, case):
    """asof_join (both directions, with and without tolerance) must equal
    the obvious per-row definition computed in Python — including equal-ts
    inclusivity, largest-tiebreak wins, and stale matches nulling out."""
    from window_aggregation_spark.operators.asof_join import asof_join

    lefts, rights, direction, tol_s = case
    left = spark.createDataFrame(
        lefts, "lid long, k long, sec long"
    ).select("lid", "k", F.timestamp_seconds("sec").alias("ts"))
    right = spark.createDataFrame(
        rights, "rid long, k long, sec long"
    ).select("rid", "k", F.timestamp_seconds("sec").alias("ts"))
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["rid"],
            tiebreak="rid", direction=direction,
            tolerance=f"{tol_s} seconds" if tol_s else None,
        ).collect()
    }
    def naive(lk, lsec, dir_):
        if dir_ == "backward":
            cand = [(rs, rid) for rid, rk, rs in rights
                    if rk == lk and rs <= lsec]
            best = max(cand) if cand else None  # latest ts, then largest rid
        else:
            cand = [(rs, rid) for rid, rk, rs in rights
                    if rk == lk and rs >= lsec]
            if cand:
                lo = min(rs for rs, _ in cand)
                best = max((rs, rid) for rs, rid in cand if rs == lo)
            else:
                best = None
        if best is not None and tol_s is not None and abs(best[0] - lsec) > tol_s:
            best = None
        return best

    expected = {}
    for lid, lk, lsec in lefts:
        if direction == "nearest":
            # tolerance filters each side FIRST, then the closer wins;
            # equidistant ties go to the backward match
            b = naive(lk, lsec, "backward")
            f = naive(lk, lsec, "forward")
            if b is not None and (
                f is None or (lsec - b[0]) <= (f[0] - lsec)
            ):
                best = b
            else:
                best = f
        else:
            best = naive(lk, lsec, direction)
        expected[lid] = best[1] if best else None
    assert got == expected


@st.composite
def stratum_case(draw):
    n_rows = draw(st.integers(1, 40))
    rows = [
        (i, draw(st.sampled_from(["a", "b", "c", None])))
        for i in range(n_rows)
    ]
    n = draw(st.integers(1, 6))
    safety = draw(st.sampled_from([0.5, 1.0, 4.0]))  # 0.5/1.0 force rescues
    return rows, n, safety


@settings(max_examples=property_examples(12), deadline=None)
@given(stratum_case())
def test_take_n_per_stratum_equals_plain_ranking(spark, case):
    """The threshold-prune + rescue plan must stay bit-identical to the
    plain ROW_NUMBER ranking for ANY safety factor — tight safeties
    undershoot on purpose so the broadcast-rescue path actually runs —
    and NULL strata must rank as their own partition."""
    from pyspark.sql import Window

    from window_aggregation_spark.operators.corpus import (
        _sample_residue,
        take_n_per_stratum,
    )

    rows, n, safety = case
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["doc_id"], r["source"])
        for r in take_n_per_stratum(
            df, "source", n, "doc_id", safety=safety
        ).collect()
    )
    w = Window.partitionBy("source").orderBy(
        _sample_residue("source", "doc_id", "strat"), F.col("doc_id")
    )
    expected = sorted(
        (r["doc_id"], r["source"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .drop("rn")
        .collect()
    )
    assert got == expected


@st.composite
def span_case(draw):
    # tiny alphabet so shared windows actually occur
    n_docs = draw(st.integers(2, 5))
    docs = []
    for i in range(n_docs):
        toks = draw(st.lists(st.sampled_from("abc"), min_size=0, max_size=25))
        docs.append((i, " ".join(toks)))
    window = draw(st.integers(2, 5))
    return docs, window


def _naive_spans(docs, window, min_docs=2):
    """Brute-force reference: mark positions whose window recurs in
    >= min_docs distinct docs, merge overlapping/adjacent marks."""
    wins = {}
    for did, text in docs:
        toks = text.split() if text else []
        for p in range(len(toks) - window + 1):
            wins.setdefault(tuple(toks[p : p + window]), set()).add(did)
    spans = []
    for did, text in docs:
        toks = text.split() if text else []
        marks = [
            p
            for p in range(len(toks) - window + 1)
            if len(wins[tuple(toks[p : p + window])]) >= min_docs
        ]
        cur = None
        for p in marks:
            if cur is not None and p <= cur[1]:  # overlap or adjacent
                cur = (cur[0], max(cur[1], p + window), cur[2] + 1)
            else:
                if cur:
                    spans.append((did, *cur))
                cur = (p, p + window, 1)
        if cur:
            spans.append((did, *cur))
    return sorted(spans)


@settings(max_examples=property_examples(15), deadline=None)
@given(span_case())
def test_duplicated_spans_equal_naive(spark, case):
    from window_aggregation_spark.operators.dedup import duplicated_spans

    docs, window = case
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicated_spans(df, "doc_id", window=window).collect()
    )
    assert got == _naive_spans(docs, window)


@settings(max_examples=property_examples(12), deadline=None)
@given(interval_case(), st.booleans())
def test_left_range_join_equals_naive_with_keys(spark, case, use_keys):
    """LEFT range join (single-pass residual-condition form, r4 rewrite)
    vs the per-row definition, with and without equality keys: every
    covered (point, interval) pair at matching key appears exactly once,
    every uncovered point appears exactly once with NULL interval
    columns, and nothing is duplicated."""
    pts, ivs, bucket_s = case
    points = spark.createDataFrame(
        [(i, s, i % 2) for i, s in enumerate(pts)],
        "pid long, sec long, k int",
    ).select("pid", "k", F.timestamp_seconds("sec").alias("ts"))
    intervals = spark.createDataFrame(
        [(j, s, e, j % 2) for j, (s, e) in enumerate(ivs)],
        "iid long, s long, e long, k int",
    ).select(
        "iid",
        "k",
        F.timestamp_seconds("s").alias("win_start"),
        F.timestamp_seconds("e").alias("win_end"),
    )
    bucket = {60: "1 minute", 3600: "1 hour", 86400: "1 day"}[bucket_s]
    keys = ["k"] if use_keys else None
    rows = range_join(
        points, intervals, "ts", "win_start", "win_end",
        keys=keys, bucket=bucket, how="left",
    ).collect()
    got = [(r["pid"], r["iid"]) for r in rows]
    matches = {
        (i, j)
        for i, p in enumerate(pts)
        for j, (s, e) in enumerate(ivs)
        if s <= p < e and (not use_keys or i % 2 == j % 2)
    }
    matched_pids = {i for i, _ in matches}
    want = sorted(matches | {
        (i, None) for i in range(len(pts)) if i not in matched_pids
    })
    assert sorted(got) == want


@st.composite
def salted_case(draw):
    n = draw(st.integers(1, 50))
    rows = [
        (
            i,
            draw(st.sampled_from(["a", "b"])),
            draw(st.integers(0, 9)),           # order col WITH ties
            draw(st.one_of(
                st.none(), st.integers(-5, 5).map(float)
            )),
        )
        for i in range(n)
    ]
    agg = draw(st.sampled_from(
        ["sum", "count", "min", "max", "avg", "var_samp", "stddev"]
    ))
    chunks = draw(st.sampled_from([1, 3, 8]))
    return rows, agg, chunks


@settings(max_examples=property_examples(15), deadline=None)
@given(salted_case())
def test_salted_running_agg_equals_plain_window_randomized(spark, case):
    """salted_running_agg vs the plain RANGE-frame window on random data
    (duplicate order values, nulls, negatives, every supported agg,
    chunk counts incl. the degenerate 1): integral inputs make every
    power sum exact, so the two-phase result must be BIT-equal to the
    same formulation over one window."""
    from pyspark.sql import Window

    from window_aggregation_spark.operators.skew import salted_running_agg

    rows, agg, chunks = case
    df = spark.createDataFrame(
        rows, "rid long, k string, o int, v double"
    )
    got = {
        r["rid"]: r["x"]
        for r in salted_running_agg(
            df, ["k"], "o", "v", agg=agg, chunks=chunks, alias="x"
        ).collect()
    }
    w = Window.partitionBy("k").orderBy("o").rangeBetween(
        Window.unboundedPreceding, 0
    )
    v = F.col("v")
    if agg in ("sum", "count", "min", "max"):
        plain = getattr(F, agg)(v).over(w)
    else:
        s = F.sum(v.cast("double")).over(w)
        s2 = F.sum(v.cast("double") * v.cast("double")).over(w)
        n = F.count(v).over(w)
        var = F.when(
            n > 1, F.greatest(F.lit(0.0), (s2 - s * s / n) / (n - 1))
        )
        plain = {
            "avg": F.when(n > 0, s / n),
            "var_samp": var,
            "stddev": F.sqrt(var),
        }[agg]
    want = {
        r["rid"]: r["x"]
        for r in df.withColumn("x", plain).collect()
    }
    assert got == want


@st.composite
def against_case(draw):
    # tiny alphabet so cross-corpus shared windows actually occur
    def doc_list(lo_id, n):
        docs = []
        for i in range(n):
            toks = draw(
                st.lists(st.sampled_from("abc"), min_size=0, max_size=25)
            )
            docs.append((lo_id + i, " ".join(toks)))
        return docs

    corpus = doc_list(0, draw(st.integers(1, 4)))
    new = doc_list(100, draw(st.integers(1, 4)))
    window = draw(st.integers(2, 5))
    return corpus, new, window


def _merge_marks(did, toks_len, window, marks):
    spans, cur = [], None
    for p in sorted(marks):
        if cur is not None and p <= cur[1]:
            cur = (cur[0], max(cur[1], p + window), cur[2] + 1)
        else:
            if cur:
                spans.append((did, *cur))
            cur = (p, p + window, 1)
    if cur:
        spans.append((did, *cur))
    return spans


@settings(max_examples=property_examples(15), deadline=None)
@given(against_case())
def test_token_spans_against_equals_naive(spark, case):
    """Incremental verbatim-passage dedup (r12): every new-side window
    that occurs ANYWHERE in the corpus is marked — every occurrence, no
    keep-one — and nothing else; brute-force reference over arbitrary
    tiny-alphabet corpora."""
    from window_aggregation_spark.operators.dedup import token_spans_against

    corpus, new, window = case
    corpus_wins = set()
    for _, text in corpus:
        toks = text.split() if text else []
        for p in range(len(toks) - window + 1):
            corpus_wins.add(tuple(toks[p : p + window]))
    expected = []
    for did, text in new:
        toks = text.split() if text else []
        marks = [
            p
            for p in range(len(toks) - window + 1)
            if tuple(toks[p : p + window]) in corpus_wins
        ]
        expected.extend(_merge_marks(did, len(toks), window, marks))
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in token_spans_against(
            ndf, cdf, "doc_id", window=window
        ).collect()
    )
    assert got == sorted(expected)


@st.composite
def sentence_increment_case(draw):
    # sentences constructed from a tiny alphabet (1-3 tokens + '.') so
    # they match the sentence_array convention exactly AND collide often
    def doc_list(lo_id, n):
        docs = []
        for i in range(n):
            n_sents = draw(st.integers(0, 6))
            sents = [
                " ".join(
                    draw(
                        st.lists(
                            st.sampled_from("ab"), min_size=1, max_size=3
                        )
                    )
                )
                + "."
                for _ in range(n_sents)
            ]
            docs.append((lo_id + i, sents))
        return docs

    corpus = doc_list(0, draw(st.integers(1, 3)))
    new = doc_list(100, draw(st.integers(1, 4)))
    window = draw(st.integers(2, 3))
    return corpus, new, window


@settings(max_examples=property_examples(15), deadline=None)
@given(sentence_increment_case())
def test_sentence_spans_increment_equals_naive(spark, case):
    """The combined batch-ingest policy (r12): corpus windows cut from
    EVERY new-side occurrence; batch-internal duplicates (not in the
    corpus) keep exactly the globally-first occurrence by (id, pos);
    brute-force reference at sentence grain."""
    from window_aggregation_spark.operators.dedup import (
        sentence_spans_increment,
    )

    corpus, new, window = case
    corpus_wins = set()
    for _, sents in corpus:
        for p in range(len(sents) - window + 1):
            corpus_wins.add(tuple(sents[p : p + window]))
    # global first occurrence per window across the batch, by (id, pos)
    first: dict = {}
    for did, sents in sorted(new):
        for p in range(len(sents) - window + 1):
            first.setdefault(tuple(sents[p : p + window]), (did, p))
    expected = []
    for did, sents in new:
        marks = []
        for p in range(len(sents) - window + 1):
            w = tuple(sents[p : p + window])
            if w in corpus_wins or first[w] != (did, p):
                marks.append(p)
        expected.extend(_merge_marks(did, len(sents), window, marks))
    cdf = spark.createDataFrame(
        [(d, " ".join(s)) for d, s in corpus], "doc_id long, text string"
    )
    ndf = spark.createDataFrame(
        [(d, " ".join(s)) for d, s in new], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in sentence_spans_increment(
            ndf, cdf, "doc_id", window=window
        ).collect()
    )
    assert got == sorted(expected)
