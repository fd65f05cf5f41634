"""Corpus-prep operators: deterministic hash splits, token-budget shard
packing (two-phase global cumsum), cross-engine-safe PII redaction."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from window_aggregation_spark.operators import corpus as cp


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(90)) + 10).alias("n_tok"),
    )


def test_split_by_hash_deterministic_and_partitioned(spark, docs):
    out = cp.split_by_hash(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    again = {
        r["doc_id"]: r["split"]
        for r in cp.split_by_hash(
            docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert rows == again
    counts: dict[str, int] = {}
    for s in rows.values():
        counts[s] = counts.get(s, 0) + 1
    # every row assigned, proportions roughly honored on 500 uniform hashes
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 500
    assert 350 <= counts["train"] <= 450


def test_split_by_hash_matches_duckdb_oracle(spark, docs):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        (r["doc_id"], r["split"])
        for r in cp.split_by_hash(docs, "doc_id", splits).collect()
    }
    expr = cp.split_by_hash_oracle_expr("doc_id", splits)
    want = set(
        duckdb.sql(
            f"SELECT doc_id, {expr} FROM (SELECT UNNEST(RANGE(0, 500)) AS doc_id)"
        ).fetchall()
    )
    assert got == want


def test_split_by_hash_no_shuffle(spark, docs):
    plan = cp.split_by_hash(
        docs, "doc_id", {"a": 1.0, "b": 1.0}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_weights_validate():
    with pytest.raises(ValueError, match="positive"):
        cp._split_cuts({"a": 0.0})


def test_pack_by_token_budget_matches_plain_window(spark, docs):
    out = cp.pack_by_token_budget(docs, "doc_id", "n_tok", 500, chunks=8)
    w = Window.orderBy("doc_id")
    plain = docs.withColumn(
        "shard",
        F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(500)
        ).cast("long"),
    )
    got = {(r["doc_id"], r["shard"]) for r in out.collect()}
    want = {(r["doc_id"], r["shard"]) for r in plain.collect()}
    assert got == want


def test_shard_manifest_disjoint_ordered_ranges(spark, docs):
    packed = cp.pack_by_token_budget(docs, "doc_id", "n_tok", 500, chunks=8)
    man = cp.shard_manifest(packed, "doc_id", "n_tok").collect()
    # totals conserve
    assert sum(r["n_docs"] for r in man) == docs.count()
    total = docs.agg(F.sum("n_tok")).first()[0]
    assert sum(r["n_tokens"] for r in man) == total
    # contiguous packing => id ranges are disjoint and ordered by shard
    for prev, cur in zip(man, man[1:]):
        assert cur["shard"] == prev["shard"] + 1
        assert prev["last_id"] < cur["first_id"]
    # every shard holds something and (except the last) fills its budget
    for r in man[:-1]:
        assert r["n_tokens"] > 0


def test_pack_by_token_budget_fill_properties(spark, docs):
    out = cp.pack_by_token_budget(docs, "doc_id", "n_tok", 500, chunks=8)
    rows = sorted(
        ((r["doc_id"], r["n_tok"], r["shard"]) for r in out.collect())
    )
    # shards are contiguous in doc order and monotone non-decreasing
    shards = [s for _, _, s in rows]
    assert shards == sorted(shards)
    assert shards[0] == 0
    assert set(shards) == set(range(max(shards) + 1))
    # offset semantics: a doc starting at exclusive prefix p is in shard
    # floor(p / budget) — so every non-final shard extends to (or past) its
    # boundary, and dropping a shard's straddling last doc always brings
    # the span back under one budget
    starts: dict[int, list[tuple[int, int]]] = {}
    p = 0
    for _, t, s in rows:
        starts.setdefault(s, []).append((p, t))
        p += t
    for s, docs_in in starts.items():
        first_start = docs_in[0][0]
        last_start, last_tok = docs_in[-1]
        assert first_start >= s * 500
        assert last_start < (s + 1) * 500
        if s < max(shards):
            assert last_start + last_tok >= (s + 1) * 500
        assert last_start - first_start < 500  # span minus straddler


def test_redact_pii_masks_and_preserves(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.org now"),
            (1, "server at 192.168.0.1 port 8080"),
            (2, "call +1-555-0123-456 today"),
            (3, "v1.2.3.4.5 release notes"),  # documented over-match
            (4, "plain text, no pii at all"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["red"] for r in df.select(
        "id", cp.redact_pii(F.col("text")).alias("red")
    ).collect()}
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "server at <IP> port 8080"
    assert got[2] == "call <PHONE> today"
    # documented RE2-compatibility trade: the last 4 segments of a
    # 5-segment version string read as a dotted quad (no lookbehind in RE2)
    assert got[3] == "v1.<IP> release notes"
    assert got[4] == "plain text, no pii at all"


def test_redact_pii_matches_duckdb(spark):
    samples = [
        "a b@c.io c",
        "ip 10.0.0.255 and mail x_y%z@sub.domain.co",
        "+44 20 7946 0958 or 555-867-5309x",
        "nothing here",
        "dot. +1 234 567 8901.",
        "v1.2.3.4.5 release notes",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, text string"
    )
    got = {
        r["id"]: r["red"]
        for r in df.select(
            "id", cp.redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    con = duckdb.connect()
    expr = cp.redact_pii_oracle_expr("text")
    for i, s in enumerate(samples):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS text)", [s]
        ).fetchone()[0]
        assert got[i] == want, (s, got[i], want)


def test_prune_frequent_tokens_drops_boilerplate_keeps_order(spark):
    df = spark.createDataFrame(
        [
            (0, "cookie notice alpha beta cookie"),
            (1, "cookie notice gamma"),
            (2, "cookie notice delta alpha"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    # 'cookie'/'notice' in 3/4 docs (75%) -> pruned at 0.5; 'alpha' in 2/4
    # (50%, not strictly above) -> kept
    out = {
        r["doc_id"]: r["pruned"]
        for r in cp.prune_frequent_tokens(
            df, "doc_id", "text", max_doc_frac=0.5
        ).collect()
    }
    assert out == {0: "alpha beta", 1: "gamma", 2: "delta alpha", 3: ""}


def test_prune_frequent_tokens_fully_pruned_doc_survives_empty(spark):
    df = spark.createDataFrame(
        [(0, "the the"), (1, "the"), (2, "the word")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["pruned"]
        for r in cp.prune_frequent_tokens(
            df, "doc_id", "text", max_doc_frac=0.9
        ).collect()
    }
    # 'the' in 100% of docs -> pruned everywhere; doc rows all survive
    assert out == {0: "", 1: "", 2: "word"}


def test_repetition_profile_values(spark):
    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),      # one token repeated
            (1, "a b a b a b"),              # alternating bigram
            (2, "all words are unique here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in cp.repetition_profile(df, "doc_id", "text").collect()
    }
    assert rows[0]["n_tok"] == 4 and rows[0]["n_uniq"] == 1
    assert rows[0]["dup_token_frac"] == 0.75
    assert rows[0]["top_bigram_count"] == 3  # 'spam spam' x3
    assert rows[0]["top_bigram_frac"] == 1.0
    assert rows[1]["top_bigram_count"] == 3  # 'a b' x3 of 5 bigrams
    assert rows[1]["top_bigram_frac"] == 0.6
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[2]["top_bigram_count"] == 1
    assert rows[3] == {
        "doc_id": 3, "n_tok": 0, "n_uniq": 0, "dup_token_frac": 0.0,
        "top_bigram_count": 0, "top_bigram_frac": 0.0,
    }


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def contam_docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally unrelated text about spark plans"),
            (3, "prefix words alpha beta gamma delta epsilon suffix"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )


def test_decontaminate_counts_distinct_shared_ngrams(spark, contam_docs):
    bench = contam_docs.where("doc_id = 1")
    out = {
        r["doc_id"]: (r["n_overlap_ngrams"], r["contaminated"])
        for r in cp.decontaminate(
            contam_docs, bench, "doc_id", "text", ngram=5
        ).collect()
    }
    # doc 1 shares both of its own 5-grams; doc 3 contains one of them
    assert out[1] == (2, True)
    assert out[3] == (1, True)
    assert out[2] == (0, False)
    # sub-ngram docs survive with zero overlap (whole-text shingle)
    assert out[4] == (0, False)


def test_decontaminate_bloom_mode_identical(spark, contam_docs):
    """The bloom pre-filter must be invisible in the result — same rows
    as broadcast mode, false positives removed by the exact semi-join."""
    bench = contam_docs.where("doc_id = 1")
    want = sorted(
        map(tuple, cp.decontaminate(
            contam_docs, bench, "doc_id", "text", ngram=5
        ).collect())
    )
    for expected in (None, 1):  # sized and deliberately UNDER-sized
        got = sorted(
            map(tuple, cp.decontaminate(
                contam_docs, bench, "doc_id", "text", ngram=5,
                mode="bloom", expected_bench_grams=expected,
            ).collect())
        )
        assert got == want
    with pytest.raises(ValueError, match="mode"):
        cp.decontaminate(contam_docs, bench, mode="nope")


def test_decontaminate_clean_benchmark_flags_nothing(spark, contam_docs):
    bench = spark.createDataFrame(
        [(99, "entirely disjoint benchmark question answer pairs here")],
        "doc_id long, text string",
    )
    out = cp.decontaminate(contam_docs, bench, "doc_id", "text", ngram=5)
    assert out.where("contaminated").count() == 0
    assert out.count() == 4


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def strat_docs(spark):
    return spark.range(0, 600).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(3)).cast("string")).alias("src"),
    )


def test_stratified_sample_rate_endpoints_and_default(spark, strat_docs):
    out = cp.stratified_sample(
        strat_docs, "src", {"s0": 1.0, "s1": 0.0}, "doc_id", default_rate=0.5
    )
    counts = {
        r["src"]: r["n"]
        for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("s0") == 200  # rate 1.0 keeps everything
    assert "s1" not in counts  # rate 0.0 keeps nothing
    assert 60 <= counts.get("s2", 0) <= 140  # default 0.5 of 200


def test_stratified_sample_decorrelated_from_split(spark, strat_docs):
    """The sample salt must decorrelate the kept set from split_by_hash:
    a 50% sample of the train split should keep ~50% of it, not ~100%."""
    split = cp.split_by_hash(strat_docs, "doc_id", {"train": 0.5, "rest": 0.5})
    train = split.where("split = 'train'")
    n_train = train.count()
    sampled = cp.stratified_sample(
        train, "src", {}, "doc_id", default_rate=0.5
    ).count()
    assert 0.3 * n_train <= sampled <= 0.7 * n_train


def test_stratified_sample_rejects_bad_rate(spark, strat_docs):
    with pytest.raises(ValueError):
        cp.stratified_sample(strat_docs, "src", {"s0": 1.5}, "doc_id")


# ---------------------------------------------------------------------------
# token-budget mixing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mix_docs(spark):
    # s0: 300 docs x 10 tokens = 3000; s1: 300 x 2 = 600; s2 untargeted
    return spark.range(0, 900).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(3)).cast("string")).alias("src"),
        F.when(F.pmod("id", F.lit(3)) == 0, F.lit("a b c d e f g h i j"))
        .otherwise(F.lit("a b"))
        .alias("text"),
    )


def test_mix_to_token_budget_hits_shares(spark, mix_docs):
    """Downsampled source lands near its quota; a source whose quota
    exceeds its mass is kept whole (cap branch); untargeted dropped."""
    out = cp.mix_to_token_budget(
        mix_docs, "src", {"s0": 0.5, "s1": 0.5}, 2_000, "doc_id"
    ).cache()
    toks = {
        r["src"]: r["t"]
        for r in out.groupBy("src").agg(F.sum("n_tok").alias("t")).collect()
    }
    # s0 quota 1000 of 3000 tokens -> keep ~1/3 (hash variance at 300 docs)
    assert 700 <= toks["s0"] <= 1300
    # s1 quota 1000 > 600 actual -> keep ALL 600 exactly
    assert toks["s1"] == 600
    assert out.where("src = 's2'").count() == 0
    out.unpersist()


def test_mix_to_token_budget_partitioning_invariant(spark, mix_docs):
    """Membership is a pure hash threshold: repartitioning the input must
    not change which rows survive."""
    kw = ("src", {"s0": 0.4, "s1": 0.2}, 1_500, "doc_id")
    a = {r["doc_id"] for r in cp.mix_to_token_budget(mix_docs, *kw).collect()}
    b = {
        r["doc_id"]
        for r in cp.mix_to_token_budget(mix_docs.repartition(17), *kw).collect()
    }
    assert a == b


def test_mix_to_token_budget_rejects_oversubscribed(spark, mix_docs):
    with pytest.raises(ValueError):
        cp.mix_to_token_budget(
            mix_docs, "src", {"s0": 0.7, "s1": 0.7}, 1_000, "doc_id"
        )
    with pytest.raises(ValueError):
        cp.mix_to_token_budget(mix_docs, "src", {"s0": 0.5}, 0, "doc_id")


def _plain_take_n(df, strata_col, n, id_col, salt="strat"):
    res = cp._sample_residue(strata_col, id_col, salt)
    w = Window.partitionBy(strata_col).orderBy(res, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def test_take_n_per_stratum_matches_plain_window(spark, strat_docs):
    got = {
        (r["doc_id"], r["src"])
        for r in cp.take_n_per_stratum(strat_docs, "src", 7, "doc_id").collect()
    }
    want = {
        (r["doc_id"], r["src"])
        for r in _plain_take_n(strat_docs, "src", 7, "doc_id").collect()
    }
    assert got == want
    assert len(got) == 21


def test_take_n_per_stratum_rescue_path_is_exact(spark, strat_docs):
    """Force the threshold to undershoot (safety well below 1) so strata
    must be rescued — the result must STILL equal the plain ranking."""
    got = {
        (r["doc_id"], r["src"])
        for r in cp.take_n_per_stratum(
            strat_docs, "src", 7, "doc_id", safety=0.01
        ).collect()
    }
    want = {
        (r["doc_id"], r["src"])
        for r in _plain_take_n(strat_docs, "src", 7, "doc_id").collect()
    }
    assert got == want


def test_take_n_per_stratum_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, src string"
    )
    out = cp.take_n_per_stratum(df, "src", 5, "doc_id")
    assert out.count() == 3


def test_deterministic_shuffle_key_and_order(spark, docs):
    out = cp.deterministic_shuffle(docs, "doc_id", num_partitions=8)
    # key matches the DuckDB rendering row-for-row
    got = {(r["doc_id"], r["shuffle_key"]) for r in out.collect()}
    want = {
        (i, k)
        for i, k in duckdb.sql(
            "SELECT doc_id, "
            + cp.deterministic_shuffle_key_duck("doc_id")
            + " FROM (SELECT unnest(range(0, 500)) AS doc_id)"
        ).fetchall()
    }
    assert got == want
    # globally sorted: partition i's keys all precede partition i+1's
    parts = out.select("shuffle_key").rdd.glom().collect()
    flat = [k["shuffle_key"] for p in parts for k in p]
    assert flat == sorted(flat)
    # a different salt is a different permutation
    other = cp.deterministic_shuffle(docs, "doc_id", salt="epoch2")
    pairs = {(r["doc_id"], r["shuffle_key"]) for r in other.collect()}
    assert dict(pairs) != dict(got)


# ---------------------------------------------------------------------------
# context-window chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_windows_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in cp.chunk_documents(
            df, "doc_id", chunk_tokens=4, overlap=1
        ).collect()
    }
    # doc 1: stride 3 -> chunks at 0,3,6 cover all 10 tokens; chunk at 9
    # would be pure overlap and must not exist
    assert out[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert out[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert out[(1, 2)] == ("t6 t7 t8 t9", 4)
    assert (1, 3) not in out
    # doc 2 shorter than one chunk: single partial chunk
    assert out[(2, 0)] == ("a b", 2)
    # empty doc: no rows
    assert not any(k[0] == 3 for k in out)


def test_chunk_documents_keep_empty_and_validation(spark):
    df = spark.createDataFrame([(3, "")], "doc_id long, text string")
    rows = cp.chunk_documents(
        df, "doc_id", chunk_tokens=4, overlap=0, keep_empty=True
    ).collect()
    assert [(r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in rows] == [
        (3, 0, "")
    ]
    with pytest.raises(ValueError):
        cp.chunk_documents(df, "doc_id", chunk_tokens=4, overlap=4)


def test_chunk_documents_every_token_covered(spark, sf_dir):
    """Union of chunk windows must cover each document's full token stream
    (no token lost at boundaries), and consecutive chunks must agree on
    their overlap region."""
    from window_aggregation_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = cp.chunk_documents(
        docs, "doc_id", chunk_tokens=32, overlap=8
    ).collect()
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"].split(" ") if r["chunk_text"] else [])
        )
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id",
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("t"),
        ).collect()
    }
    for doc_id, lst in by_doc.items():
        lst.sort()
        rebuilt = list(lst[0][1])
        for _, ctoks in lst[1:]:
            assert rebuilt[-8:] == ctoks[:8]  # overlap agreement
            rebuilt.extend(ctoks[8:])
        assert rebuilt == toks[doc_id]


def test_pack_sequences_tiles_the_token_stream(spark, docs):
    """Concat-and-chop invariants: tok_start is the exact exclusive prefix
    sum in id order; each doc's sequence span matches its offset+length;
    and every interior sequence boundary falls strictly inside or between
    docs (the stream tiles with no gaps or overlaps)."""
    L = 64
    rows = sorted(
        cp.pack_sequences(docs, "doc_id", "n_tok", L, chunks=8).collect(),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    for r in rows:
        assert r["tok_start"] == cum
        assert r["off_in_seq"] == cum % L
        assert r["seq_first"] == cum // L
        end = cum + r["n_tok"]
        expect_last = max(cum // L, (end - 1) // L)
        assert r["seq_last"] == expect_last
        cum = end
    # every sequence id up to the last is covered by some document
    covered = set()
    for r in rows:
        covered.update(range(r["seq_first"], r["seq_last"] + 1))
    assert covered == set(range(rows[-1]["seq_last"] + 1))


def test_pack_sequences_empty_doc_pins_to_offset_sequence(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, 50)], "doc_id long, n_tok int"
    )
    got = {
        r["doc_id"]: r
        for r in cp.pack_sequences(df, "doc_id", "n_tok", 64).collect()
    }
    # doc 2 starts at offset 100 (sequence 1) and contributes nothing:
    # seq_last must not underflow below seq_first
    assert got[2]["tok_start"] == 100
    assert got[2]["seq_first"] == got[2]["seq_last"] == 1
    # doc 1 crosses the 64-boundary: spans sequences 0..1
    assert (got[1]["seq_first"], got[1]["seq_last"]) == (0, 1)
    assert got[3]["off_in_seq"] == 100 % 64


class TestWeightedSample:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, w bigint")

    def test_exact_n_and_partitioning_invariant(self, spark):
        rows = [(i, 10 + i % 7) for i in range(200)]
        from window_aggregation_spark.operators.corpus import weighted_sample_n

        df = self._df(spark, rows)
        a = {r.doc_id for r in weighted_sample_n(df, "doc_id", "w", 20).collect()}
        b = {
            r.doc_id
            for r in weighted_sample_n(
                df.repartition(13), "doc_id", "w", 20
            ).collect()
        }
        assert len(a) == 20 and a == b

    def test_heavy_rows_favored(self, spark):
        """One row with 500x the weight of nine others must be sampled
        (n=3 of 10) in the vast majority of salts."""
        from window_aggregation_spark.operators.corpus import weighted_sample_n

        rows = [(0, 5000)] + [(i, 10) for i in range(1, 10)]
        df = self._df(spark, rows)
        hits = sum(
            0 in {
                r.doc_id
                for r in weighted_sample_n(
                    df, "doc_id", "w", 3, salt=f"s{k}"
                ).collect()
            }
            for k in range(20)
        )
        assert hits >= 18

    def test_nonpositive_and_null_weights_excluded(self, spark):
        from window_aggregation_spark.operators.corpus import weighted_sample_n

        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, -1), (4, None), (5, 5)],
            "doc_id bigint, w bigint",
        )
        out = {r.doc_id for r in weighted_sample_n(df, "doc_id", "w", 10).collect()}
        assert out == {1, 5}

    def test_topn_plan_no_global_sort(self, spark):
        from window_aggregation_spark.operators.corpus import weighted_sample_n

        df = self._df(spark, [(i, 1 + i) for i in range(50)])
        plan = weighted_sample_n(df, "doc_id", "w", 5)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan

    def test_n_validation(self, spark):
        from window_aggregation_spark.operators.corpus import weighted_sample_n

        with pytest.raises(ValueError, match="positive"):
            weighted_sample_n(self._df(spark, [(1, 1)]), "doc_id", "w", 0)

    def test_nan_weight_excluded_and_null_id_cross_engine(self, spark, duck):
        """Review regressions: NaN passes `> 0` under double total
        ordering and would sort FIRST under desc; NULL ids must hash the
        sentinel identically on both engines (Spark concat propagates
        NULL, DuckDB concat swallows it)."""
        import math

        from window_aggregation_spark.operators.corpus import (
            weighted_sample_n,
            weighted_sample_n_oracle_sql,
        )

        df = spark.createDataFrame(
            [(1, 5.0), (2, math.nan), (None, 50.0), (4, 5.0), (5, 1.0)],
            "doc_id bigint, w double",
        )
        out = weighted_sample_n(df, "doc_id", "w", 2)
        picked = {r.doc_id for r in out.collect()}
        assert 2 not in picked and len(picked) == 2
        values = ("(VALUES (1, CAST(5.0 AS DOUBLE)), (2, CAST('nan' AS DOUBLE)), "
                  "(NULL, CAST(50.0 AS DOUBLE)), (4, CAST(5.0 AS DOUBLE)), "
                  "(5, CAST(1.0 AS DOUBLE))) AS t(doc_id, w)")
        oracle = duck.sql(weighted_sample_n_oracle_sql(
            values, "doc_id", "w", 2, select_cols="doc_id, w"
        )).fetchall()
        assert {r[0] for r in oracle} == picked


def test_split_leakage_safe_keeps_clusters_together(spark):
    """Near-dup cluster members must share a split even when their PLAIN
    per-doc hash splits disagree — the contamination the operator
    exists to prevent — and singletons must equal the plain split (the
    component label is their own id)."""
    from window_aggregation_spark.operators import corpus as cp

    rows = []
    for i in range(40):
        # pairs (2i, 2i+1) are near-duplicates of each other ONLY:
        # per-pair-unique tokens dominate the shingle set, so cross-pair
        # Jaccard is ~0 while within-pair Jaccard is ~0.9
        t = " ".join(f"tok{i}x{j}" for j in range(30))
        rows.append((2 * i, t + " alpha"))
        rows.append((2 * i + 1, t + " beta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    splits = {"train": 0.5, "test": 0.5}
    plain = {
        r.doc_id: r.split
        for r in cp.split_by_hash(docs, "doc_id", splits).collect()
    }
    # the plain split separates at least one near-dup pair (that's the bug)
    assert any(plain[2 * i] != plain[2 * i + 1] for i in range(40))
    safe = cp.split_leakage_safe(docs, "doc_id", splits, threshold=0.3)
    got = {r.doc_id: (r.component, r.split) for r in safe.collect()}
    for i in range(40):
        assert got[2 * i] == got[2 * i + 1], f"pair {i} separated"
        assert got[2 * i][0] == 2 * i  # component = min id of the pair
    # a genuinely unique doc keeps its plain assignment
    solo = spark.createDataFrame(
        [(999, "completely unrelated singleton text about catalyst")],
        "doc_id long, text string",
    )
    both = docs.unionByName(solo)
    safe2 = {r.doc_id: r.split
             for r in cp.split_leakage_safe(
                 both, "doc_id", splits, threshold=0.3).collect()}
    plain2 = {r.doc_id: r.split
              for r in cp.split_by_hash(solo, "doc_id", splits).collect()}
    assert safe2[999] == plain2[999]


def test_prune_duplicated_lines_cross_doc_boilerplate(spark):
    """Line-level C4/CCNet cleaning: lines over the doc-frequency bound
    vanish corpus-wide (nav bar in 4/4 docs, cookie banner in 2/4),
    per-doc-unique lines and BLANK lines survive in order, CRLF input
    agrees with its LF twin, fully-boilerplate docs come back as the
    empty string, and the DuckDB oracle matches exactly."""
    import duckdb as _duck
    import pandas as pd

    docs = [
        (1, "NAV BAR\ncontent one\n\nrare footer"),
        (2, "NAV BAR\ncontent two\nCOOKIE BANNER"),
        (3, "NAV BAR\r\ncontent three\r\nCOOKIE BANNER"),
        (4, "NAV BAR"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.pruned_text, r.n_pruned_lines)
        for r in cp.prune_duplicated_lines(
            df, "doc_id", max_doc_frac=0.26
        ).collect()
    }
    assert got[1] == ("content one\n\nrare footer", 1)
    assert got[2] == ("content two", 2)
    assert got[3] == ("content three", 2)  # CRLF == LF twin
    assert got[4] == ("", 1)  # fully boilerplate -> empty, not NULL
    con = _duck.connect()
    con.register("docs_t", pd.DataFrame(docs, columns=["doc_id", "text"]))
    want = {
        int(r[0]): (r[1], int(r[2]))
        for r in con.execute(
            cp.prune_duplicated_lines_oracle_sql(
                "docs_t", "doc_id", max_doc_frac=0.26
            )
        ).fetchall()
    }
    assert got == want


def test_prune_duplicated_lines_join_strategy_matches_array(spark):
    """VERDICT r10 #5: the broadcast-hash-join fallback (for blocklists
    past the documented bound) is value-identical to the one-row-array
    fast path — same prunes, same blank-line exemption, same
    empty-string reconstruction — and 'auto' dispatches by the frequent
    -line count (forced both ways via blocklist_join_threshold)."""
    docs = [
        (1, "NAV BAR\ncontent one\n\nrare footer"),
        (2, "NAV BAR\ncontent two\nCOOKIE BANNER"),
        (3, "NAV BAR\r\ncontent three\r\nCOOKIE BANNER"),
        (4, "NAV BAR"),
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def run(**kw):
        return {
            r.doc_id: (r.pruned_text, r.n_pruned_lines)
            for r in cp.prune_duplicated_lines(
                df, "doc_id", max_doc_frac=0.26, **kw
            ).collect()
        }

    fast = run(strategy="array")
    assert fast[2] == ("content two", 2)
    assert fast[4] == ("", 1)
    assert run(strategy="join") == fast
    # auto: 2 frequent lines -> array below threshold, join above
    assert run(strategy="auto", blocklist_join_threshold=0) == fast
    assert run(strategy="auto", blocklist_join_threshold=10) == fast
    with pytest.raises(ValueError, match="unknown strategy"):
        cp.prune_duplicated_lines(df, "doc_id", strategy="bogus")


# ---------------------------------------------------------------------------
# filter_blocklisted_pages — the C4 dirty-word page filter (r13)
# ---------------------------------------------------------------------------

_BL_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "CLASS and glass but never that other word"),       # substring traps
    (3, "bad"),                                             # bare hit
    (4, "bad bad bad worse bad"),                           # repeats: 2 distinct
    (5, "embedded badword and bad_word and bad9 and 9bad"),  # token
    # boundaries: bad_word splits to 'bad'+'word' (hit) but bad9/9bad
    # are single alnum tokens (digits are token characters — no hit)
    (6, "punctuation bad, bad. bad! (bad)"),                # punct boundaries
    (7, "BAD Bad bAd"),                                     # case folding
    (8, None),
    (9, ""),
    (10, "worse\tthings\nhappen at sea"),                   # ws zoo
]
_BL_WORDS = ["bad", "WORSE", "ass", "bad"]  # dupes + case + substring bait


def _bl_expected():
    # hand-derived distinct-hit counts under the [a-z0-9]+ tokenizer
    return {1: 0, 2: 0, 3: 1, 4: 2, 5: 1, 6: 1, 7: 1, 8: 0, 9: 0, 10: 1}


def test_blocklist_filter_matches_oracle_and_hand_counts(spark, tmp_path):
    path = str(tmp_path / "bl_docs.parquet")
    spark.createDataFrame(_BL_DOCS, "doc_id long, text string") \
        .coalesce(1).write.parquet(path)
    frame = spark.read.parquet(path)
    got = cp.filter_blocklisted_pages(
        frame, words=_BL_WORDS, strategy="array"
    ).select("doc_id", "n_blocklist_hits", "blocklist_pass")
    rows = {r.doc_id: r for r in got.collect()}
    for did, want in _bl_expected().items():
        assert rows[did].n_blocklist_hits == want, (did, rows[did])
        assert rows[did].blocklist_pass == (want == 0)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW bl_docs AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        want_rel = con.sql(cp.filter_blocklisted_pages_oracle_sql(
            "bl_docs", words=_BL_WORDS))
        from tests.conftest import assert_frames_match
        assert_frames_match(got, want_rel, sort_cols=["doc_id"])
    finally:
        con.close()


def test_blocklist_filter_join_strategy_is_value_identical(spark):
    df = spark.createDataFrame(_BL_DOCS, "doc_id long, text string")
    a = cp.filter_blocklisted_pages(df, words=_BL_WORDS, strategy="array") \
        .select("doc_id", "n_blocklist_hits", "blocklist_pass")
    j = cp.filter_blocklisted_pages(df, words=_BL_WORDS, strategy="join") \
        .select("doc_id", "n_blocklist_hits", "blocklist_pass")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, j.collect()))
    # a DataFrame-typed blocklist routes through join and agrees too
    bl_df = spark.createDataFrame(
        [(w,) for w in _BL_WORDS], "word string")
    d = cp.filter_blocklisted_pages(df, words=bl_df, strategy="auto") \
        .select("doc_id", "n_blocklist_hits", "blocklist_pass")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, d.collect()))
    # auto resolves by list size: tiny list -> array (no exchange)
    plan_auto = cp.filter_blocklisted_pages(
        df, words=_BL_WORDS, strategy="auto"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_auto
    # forced join carries only (id, token) through its exchanges —
    # never the text column
    plan_join = cp.filter_blocklisted_pages(
        df, words=_BL_WORDS, strategy="join"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan_join


def test_blocklist_filter_validation(spark):
    df = spark.createDataFrame(_BL_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="not a single"):
        cp.filter_blocklisted_pages(df, words=["two words"])
    with pytest.raises(ValueError, match="not a single"):
        cp.filter_blocklisted_pages(df, words=[""])
    with pytest.raises(ValueError, match="unknown strategy"):
        cp.filter_blocklisted_pages(df, words=["ok"], strategy="nope")
    bl_df = spark.createDataFrame([("w",)], "word string")
    with pytest.raises(ValueError, match="DataFrame blocklist"):
        cp.filter_blocklisted_pages(df, words=bl_df, strategy="array")
    # empty list: everything passes, both engines
    got = cp.filter_blocklisted_pages(df, words=[], strategy="array")
    assert all(r.blocklist_pass for r in got.collect())
