"""Adversarial cross-engine differential for the Gopher text operators.

The fixture corpus is single-line, symbol-free, space-separated text, so
the suite gate never exercises the quality rules' bullet / ellipsis /
hash / newline / unicode branches against DuckDB — exactly the places
where engine string semantics (regex whitespace classes, ltrim, string
slicing, replace) could silently diverge. This test writes a handcrafted
adversarial corpus to parquet, runs the Spark operators and their DuckDB
oracle SQL over the SAME files, and requires exact agreement — the same
comparison the driver gate performs, pointed at the nasty inputs.
"""

from __future__ import annotations

import duckdb
import pytest

from window_aggregation_spark.operators.text import (
    quality_signals_gopher,
    quality_signals_gopher_oracle_sql,
    repetition_signals_table,
    repetition_signals_table_oracle_sql,
)

from tests.conftest import assert_frames_match

ADVERSARIAL_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    # bullet zoo: every bullet char, with leading spaces and tabs
    (2, "- dash bullet\n * starred with space\n\t• unicode bullet\nplain"),
    # ellipsis endings, ellipsis floods, bare dots
    (3, "to be continued...\nor not...\nfive.....dots\n..."),
    # hash floods and inline hashes
    (4, "# heading\n## sub\nuse #tag and ### and the usual words of it"),
    # whitespace zoo: tabs, multiple spaces, leading/trailing runs
    (5, "\t\tindented\tby   tabs  and   runs   of    spaces\t"),
    # unicode text: accents, CJK (no [A-Za-z] letters in CJK words)
    (6, "café naïve 北京 的 résumé — em-dash and ünïcode"),
    # empty-ish and degenerate docs
    (7, ""),
    (8, None),
    (9, " "),
    (10, "\n\n\n"),
    (11, "x"),
    (12, "#"),
    (13, "..."),
    # a doc that PASSES every quality rule: 60 words, sane lengths,
    # letters everywhere, stopwords present
    (14, " ".join(["the quick brown fox jumps over that lazy dog with"] * 6)),
    # repetition-table shapes: a 4-cycle (dups at every n) and near-
    # distinct text (no dups), with newlines mixed in
    (15, "a b c d\na b c d\na b c d"),
    (16, "one two three four five six seven eight nine ten eleven twelve"),
    # numbers-only and mixed alnum words
    (17, "123 456 789 0 42a b7 99... #1"),
    # quotes and punctuation stuck to words
    (18, "'quoted' \"double\" (paren) end. comma, semi; colon: the of"),
]


@pytest.fixture(scope="module")
def adv(spark, tmp_path_factory):
    """The adversarial corpus as (spark frame, duckdb view) over ONE
    parquet file — both engines read the same bytes."""
    path = str(tmp_path_factory.mktemp("advdocs") / "docs.parquet")
    df = spark.createDataFrame(ADVERSARIAL_DOCS, "doc_id long, text string")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW adv_docs AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    frame = spark.read.parquet(path)
    yield frame, con
    con.close()


def test_quality_rules_match_oracle_on_adversarial_text(adv):
    frame, con = adv
    got = quality_signals_gopher(frame)
    want = con.sql(quality_signals_gopher_oracle_sql(table="adv_docs"))
    assert_frames_match(got, want, sort_cols=["doc_id"])
    # sanity on coverage: the corpus must actually exercise the branches
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[2].bullet_line_frac == 3 / 4
    assert rows[3].ellipsis_line_frac > 0
    assert rows[4].hash_word_ratio > 0.1
    assert rows[14].quality_pass is True
    assert sum(1 for r in rows.values() if r.quality_pass) == 1


def test_repetition_table_matches_oracle_on_adversarial_text(adv):
    frame, con = adv
    got = repetition_signals_table(frame)
    want = con.sql(repetition_signals_table_oracle_sql(table="adv_docs"))
    assert_frames_match(got, want, sort_cols=["doc_id"])
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[15].dup_5gram_frac == 1.0  # the 4-cycle duplicates fully
    assert rows[16].dup_5gram_frac == 0.0
    assert rows[7].top_2gram_frac is None  # empty doc stays NULL
