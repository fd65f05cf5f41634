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
    c4_clean,
    c4_clean_oracle_sql,
    quality_signals_gopher,
    quality_signals_gopher_oracle_sql,
    repetition_signals_lines,
    repetition_signals_lines_oracle_sql,
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
    # lone-CR-terminated line (old-Mac ending, survives the CRLF-only
    # normalization): Java's '$' matches before a final CR, RE2's does
    # not — the c4 line-end anchor must be \z so both engines agree
    (19, "One two three four five.\rmore text after the lone cr."),
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


def test_language_id_detects_char_based_languages(spark, tmp_path):
    """The zh stopword list is CJK characters the latin tokenizer drops
    entirely — before char-occurrence scoring, Chinese text was
    permanently 'und' (and the oracle mirrored the bug, so the gate
    could never catch it). Both engines must agree AND actually detect
    each language."""
    from window_aggregation_spark.operators.text import (
        language_id,
        language_id_oracle_expr,
    )

    docs = [
        (1, "the cat sat on the mat and it is that for a reason"),
        (2, "el perro y la casa de que un gato en por con los"),
        (3, "der hund und die katze ist von mit den ein zu haus"),
        (4, "le chien et la maison de les est dans que pour"),
        (5, "我 在 北京 的 家 有 他 和 这 个 人 不 是 我 的"),
        (6, "zzz qqq xxx www"),  # no stopwords anywhere -> und
        (7, None),
        # mixed: 3 zh char occurrences vs 2 en token hits -> zh wins
        (8, "the cat 的 的 的 sat the"),
    ]
    path = str(tmp_path / "langdocs.parquet")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.coalesce(1).write.parquet(path)
    frame = spark.read.parquet(path)
    got = language_id(frame).select("doc_id", "lang_pred")
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW langdocs AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        want = con.sql(
            f"SELECT doc_id, {language_id_oracle_expr()} FROM langdocs"
        )
        assert_frames_match(got, want, sort_cols=["doc_id"])
    finally:
        con.close()
    preds = {r.doc_id: r.lang_pred for r in got.collect()}
    assert preds == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh",
                     6: "und", 7: "und", 8: "zh"}


def test_repetition_table_matches_oracle_on_adversarial_text(adv):
    frame, con = adv
    got = repetition_signals_table(frame)
    want = con.sql(repetition_signals_table_oracle_sql(table="adv_docs"))
    assert_frames_match(got, want, sort_cols=["doc_id"])
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[15].dup_5gram_frac == 1.0  # the 4-cycle duplicates fully
    assert rows[16].dup_5gram_frac == 0.0
    assert rows[7].top_2gram_frac is None  # empty doc stays NULL


def test_repetition_lines_match_oracle_on_adversarial_text(adv):
    """The line/paragraph duplicate signals on the SAME adversarial
    corpus: newline zoo, CRLF-free unicode lines, whitespace-only docs,
    NULL text — Spark and DuckDB must agree exactly, and the corpus
    must exercise duplicate lines, duplicate paragraphs, and the
    empty-doc NULL path."""
    frame, con = adv
    got = repetition_signals_lines(frame)
    want = con.sql(repetition_signals_lines_oracle_sql(table="adv_docs"))
    assert_frames_match(got, want, sort_cols=["doc_id"])
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[15].dup_line_frac == 1.0  # three identical lines
    assert rows[15].n_paras == 1
    assert rows[16].dup_line_frac == 0.0
    assert rows[10].n_lines == 0  # newline-only doc has no units
    assert rows[10].dup_line_frac is None
    assert rows[8].dup_para_frac is None  # NULL text


def test_c4_clean_matches_oracle_on_adversarial_text(adv):
    """The C4 heuristics over the adversarial corpus, plus pinned rule
    behavior: terminal-punctuation retention, the 3-word line minimum,
    javascript-line removal, and the page-level discards."""
    frame, con = adv
    got = c4_clean(frame)
    want = con.sql(c4_clean_oracle_sql(table="adv_docs"))
    assert_frames_match(got, want, sort_cols=["doc_id"])
    rows = {r.doc_id: r for r in got.collect()}
    # doc 3 'to be continued...' lines end in '.', but no doc reaches
    # 5 sentences except doc 14 — which has no terminal punct at all
    assert all(not r.c4_keep for r in rows.values())
    assert rows[8].c4_text == "" and rows[8].n_kept_lines == 0


def test_c4_clean_rule_behavior(spark):
    """Each published rule bites on a targeted page: javascript lines
    vanish, short/punctuationless lines vanish, lorem-ipsum and
    curly-brace pages are discarded, quoted sentence ends count, CRLF
    agrees with LF, and a 5-sentence page survives."""
    docs = [
        (1, "A good sentence here today. Another one follows after! "
            "Is this a question? Yes it surely is. And a fifth one."),
        (2, "drop me no punct\nthis one has javascript in it.\n"
            "Good sentence one here. Good sentence two here. "
            "Good sentence three here. Good four here. Good five here."),
        (3, "code page { x } here. One two three. Two more here. "
            "Three more here. Four more here. Five more here."),
        (4, "lorem ipsum dolor sit. One two three. Two here now. "
            "Three here now. Four here now. Five here now."),
        (5, "Only two sentences here. Not enough for the page rule."),
        (6, 'Quoted end works fine." Second sentence too. Third plain. '
            "Fourth plain. Fifth plain."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in c4_clean(df).collect()}
    assert rows[1].c4_keep and rows[1].n_sentences == 5
    assert rows[2].c4_keep  # javascript + punctless lines dropped,
    assert "javascript" not in rows[2].c4_text  # page itself survives
    assert rows[2].n_kept_lines == 1
    assert not rows[3].c4_keep  # curly brace
    assert not rows[4].c4_keep  # lorem ipsum
    assert not rows[5].c4_keep  # < 5 sentences
    assert rows[6].c4_keep  # closing quote after terminal punct


def test_minhash_pairs_match_oracle_on_adversarial_text(spark, tmp_path):
    """MinHash+LSH dedup on degenerate documents — NULL text, empty
    text, whitespace-only, sub-shingle-length, unicode, and genuine
    near-dups — must agree with the first-principles DuckDB oracle
    exactly: the shingle edge cases (whole-text shingle for short docs,
    NULL propagation) are where the two engines could silently split."""
    from window_aggregation_spark.operators.dedup import (
        minhash_dedup_pairs,
    )
    from window_aggregation_spark.suite import _duck_minhash_lsh_sql

    base = (
        "the quick brown fox jumps over the lazy dog near the river "
        "while the miller watches the water turn the old wheel slowly"
    )
    docs = [
        (1, base),
        (2, base + " tonight"),          # near-dup of 1
        (3, base.replace("river", "creek")),  # near-dup of 1
        (4, "completely different text about spark shuffle partitions"),
        (5, None),
        (6, ""),
        (7, "   \t\n  "),
        (8, "one"),          # below shingle width -> whole-text shingle
        (9, "one two"),
        (10, "one"),         # identical short doc: pairs with 8
        (11, "café 北京 的 naïve café 北京 的 naïve café 北京 的 naïve"),
        (12, "café 北京 的 naïve café 北京 的 naïve café 北京 的 naïve!"),
    ]
    path = str(tmp_path / "dedupdocs.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(path)
    frame = spark.read.parquet(path)
    got = minhash_dedup_pairs(frame, "doc_id", threshold=0.3)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        want = con.sql(_duck_minhash_lsh_sql())
        assert_frames_match(got, want, sort_cols=["id_a", "id_b"])
    finally:
        con.close()
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    assert (1, 2) in pairs and (1, 3) in pairs  # real near-dups found
    assert (8, 10) in pairs  # identical sub-shingle docs pair up
    # token-less docs (empty, whitespace-only) share the [''] whole-text
    # shingle and ARE duplicates of each other — the oracle used to
    # diverge here (DuckDB array_to_string([]) is NULL, crashing the
    # portable hash, where Spark concat_ws yields '')
    assert (6, 7) in pairs
    assert not any(5 in p for p in pairs)  # NULL text stays alone


def test_fuzzed_text_matches_oracle_across_engines(spark, tmp_path):
    """Seeded random fuzz over a deliberately nasty alphabet — including
    the VERTICAL TAB (\\x0B), which Java's \\s counts as whitespace but
    DuckDB's RE2 does not: any shared '\\s' between an operator and its
    oracle diverges on it, which is why every regex is now an explicit
    character class. 200 random docs, exact cross-engine agreement for
    token counts, the quality rules, and the language id."""
    import random

    from window_aggregation_spark.operators.text import (
        language_id,
        language_id_oracle_expr,
        token_counts,
        token_counts_oracle_exprs,
    )

    rng = random.Random(20260815)
    pieces = [
        "the", "of", "and", "cat", "x", "42", "#", "...", "-", "*", "•",
        "的", "é", "WORD", "a#b", "..", "....", "", " ", "  ", "\t",
        "\n", "\x0b", "\f", "\r", "\r\n", " \t ", "\n\n",
        # PII-shaped fragments (and near-misses) for the redaction arm
        "bob@example.com", "x@y.co", "not@an", "10.0.0.1", "1.2.3",
        "+49 170 555-0100", "v1.2.3.4.5",
    ]
    docs = []
    for i in range(200):
        n = rng.randint(0, 40)
        docs.append((i, "".join(rng.choice(pieces) for _ in range(n))))
    docs.append((1000, None))
    path = str(tmp_path / "fuzzdocs.parquet")
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    frame.coalesce(1).write.parquet(path)
    frame = spark.read.parquet(path)
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW fuzzdocs AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        assert_frames_match(
            token_counts(frame).select("doc_id", "ws_tokens", "bpe_tokens"),
            con.sql(
                f"SELECT doc_id, {token_counts_oracle_exprs()} FROM fuzzdocs"
            ),
            sort_cols=["doc_id"],
        )
        assert_frames_match(
            quality_signals_gopher(frame),
            con.sql(quality_signals_gopher_oracle_sql(table="fuzzdocs")),
            sort_cols=["doc_id"],
        )
        assert_frames_match(
            language_id(frame).select("doc_id", "lang_pred"),
            con.sql(
                f"SELECT doc_id, {language_id_oracle_expr()} FROM fuzzdocs"
            ),
            sort_cols=["doc_id"],
        )
        from pyspark.sql import functions as F

        from window_aggregation_spark.operators.corpus import (
            redact_pii,
            redact_pii_oracle_expr,
        )
        from window_aggregation_spark.operators.text import (
            fingerprint,
            fingerprint_oracle_expr,
        )

        assert_frames_match(
            fingerprint(frame).select("doc_id", "fp"),
            con.sql(
                f"SELECT doc_id, {fingerprint_oracle_expr()} FROM fuzzdocs"
            ),
            sort_cols=["doc_id"],
        )
        assert_frames_match(
            frame.select(
                "doc_id", redact_pii(F.col("text")).alias("red")
            ),
            con.sql(
                f"SELECT doc_id, {redact_pii_oracle_expr('text')} AS red "
                "FROM fuzzdocs"
            ),
            sort_cols=["doc_id"],
        )
        assert_frames_match(
            c4_clean(frame),
            con.sql(c4_clean_oracle_sql(table="fuzzdocs")),
            sort_cols=["doc_id"],
        )
        # r10 line-grain operators over the same nasty corpus: the
        # newline/CRLF/vertical-tab zoo is exactly where line splitting
        # and blank-line filtering can diverge between engines
        assert_frames_match(
            repetition_signals_lines(frame),
            con.sql(repetition_signals_lines_oracle_sql(table="fuzzdocs")),
            sort_cols=["doc_id"],
        )
        from window_aggregation_spark.operators.corpus import (
            prune_duplicated_lines,
            prune_duplicated_lines_oracle_sql,
        )

        assert_frames_match(
            prune_duplicated_lines(frame, "doc_id", max_doc_frac=0.02),
            con.sql(
                prune_duplicated_lines_oracle_sql(
                    "fuzzdocs", "doc_id", max_doc_frac=0.02
                )
            ),
            sort_cols=["doc_id"],
        )
    finally:
        con.close()


def test_gopher_quality_gated_per_language(spark):
    """VERDICT r10 #7 (carrying ADVICE r9): the published Gopher rules
    encode English/Latin assumptions (ASCII alpha words, the 8 English
    stopwords), so clean Russian/Chinese documents mass-fail them. The
    per-language hook must (a) detect the language in-predicate and
    relax exactly those rules, (b) keep the published defaults for
    English and undetected text — garbage still fails — and (c) accept
    an existing language column instead of re-detecting."""
    from window_aggregation_spark.operators.text import (
        gopher_quality_pass,
        gopher_quality_pass_by_language,
        language_pred,
    )

    ru = " ".join(
        ["это новая наука и все люди хотят знать больше о мире вокруг"] * 5
    )
    zh = " ".join(["我 在 北京 的 家 有 他 和 这 个 人 不 是 我 的"] * 5)
    en_good = " ".join(
        ["the quick brown fox jumps over that lazy dog with great energy"]
        * 5
    )
    en_junk = " ".join(str(1111 * i) for i in range(60))
    docs = [(1, ru), (2, zh), (3, en_good), (4, en_junk)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    langs = {
        r.doc_id: r.lp
        for r in df.select(
            "doc_id", language_pred("text").alias("lp")
        ).collect()
    }
    assert langs == {1: "ru", 2: "zh", 3: "en", 4: "und"}
    raw = {
        r.doc_id: r.qp
        for r in df.select(
            "doc_id", gopher_quality_pass("text").alias("qp")
        ).collect()
    }
    # the spurious mass-fail the hook exists to stop
    assert raw == {1: False, 2: False, 3: True, 4: False}
    gated = {
        r.doc_id: r.qp
        for r in df.select(
            "doc_id",
            gopher_quality_pass_by_language("text").alias("qp"),
        ).collect()
    }
    assert gated == {1: True, 2: True, 3: True, 4: False}
    # reusing a trusted language column skips re-detection
    with_lang = df.withColumn("lang", language_pred("text"))
    via_col = {
        r.doc_id: r.qp
        for r in with_lang.select(
            "doc_id",
            gopher_quality_pass_by_language(
                "text", lang_col="lang"
            ).alias("qp"),
        ).collect()
    }
    assert via_col == gated
    # empty overrides degrade to the published rules exactly
    none_gated = {
        r.doc_id: r.qp
        for r in df.select(
            "doc_id",
            gopher_quality_pass_by_language(
                "text", per_language_overrides={}
            ).alias("qp"),
        ).collect()
    }
    assert none_gated == raw


def test_language_tier_r12_detects_and_gates(spark):
    """VERDICT r11 #7: the pt/it/nl/ja tier — each new language (a) is
    detected by both engines identically (the oracle derives from the
    same STOPWORDS/LANG_PRIORITY tables, so parity is structural, but
    pin it anyway), (b) no longer mass-fails the English-stopword rule
    under the default per-language overrides, (c) never flips a
    document the r11 detector already labeled (additions append after
    the original six in priority, so ties keep the old winner)."""
    import duckdb as _duck
    import pandas as pd

    from window_aggregation_spark.operators.text import (
        gopher_quality_pass,
        gopher_quality_pass_by_language,
        language_id_oracle_expr,
        language_pred,
    )

    fixtures = {
        "pt": "este texto fala de um projeto que vamos fazer para o time "
              "com apoio da empresa e não vamos parar em nada do caminho",
        "it": "questo testo parla di un progetto che il gruppo vuole fare "
              "per una azienda e non sono cose banali ma idee con futuro",
        "nl": "de groep schrijft een verhaal over het werk dat niet af is "
              "en wij zijn van plan om op te schieten met de volgende stap",
        # segmented (the zh/ja overrides assume segmented text — the
        # documented convention; unsegmented CJK is one giant "word")
        "ja": "これ は 新しい 研究 の 話 です 。 私 たち は 毎日 データ "
              "を 集めて 、 結果 を 調べて から 報告 します 。",
        # the original six must keep their labels (regression guard)
        "en": "the quick brown fox jumps over that lazy dog with energy "
              "and it is a fine day for all of the animals in the field",
        "es": "el grupo de personas que vive en la ciudad quiere un futuro "
              "mejor por los niños y con mucho trabajo los vamos a ayudar",
        "fr": "le groupe de personnes qui vivent dans les villes et les "
              "champs est pour la science et que des bonnes idées pour tous",
    }
    rows = [(i, lang, (txt + " ") * 4) for i, (lang, txt)
            in enumerate(fixtures.items())]
    df = spark.createDataFrame(rows, "doc_id long, want string, text string")
    got = {
        r.want: r.lp
        for r in df.select(
            "want", language_pred("text").alias("lp")
        ).collect()
    }
    assert got == {lang: lang for lang in fixtures}
    con = _duck.connect()
    try:
        con.register(
            "t", pd.DataFrame(rows, columns=["doc_id", "want", "text"])
        )
        oracle = dict(
            con.execute(
                f"SELECT want, {language_id_oracle_expr('text')} FROM t"
            ).fetchall()
        )
    finally:
        con.close()
    assert oracle == got
    # gating: every clean non-English doc fails the published rules
    # (the 8-English-stopword requirement) but passes the gated verdict
    non_en = df.where("want <> 'en'")
    raw = {
        r.want: r.qp
        for r in non_en.select(
            "want", gopher_quality_pass("text").alias("qp")
        ).collect()
    }
    assert raw == {lang: False for lang in fixtures if lang != "en"}
    gated = {
        r.want: r.qp
        for r in non_en.select(
            "want", gopher_quality_pass_by_language("text").alias("qp")
        ).collect()
    }
    assert gated == {lang: True for lang in fixtures if lang != "en"}


def test_und_policy_structural_judges_unknown_languages_on_structure(spark):
    """VERDICT r11 #7, the honesty boundary: languages past the
    detector's tier route to 'und'. und_policy='structural' judges them
    on the structural rules only (clean Polish text passes; digit soup
    and a bullet-list page still fail), the default keeps the r11
    English-tuned filtering, an explicit 'und' override wins over the
    policy, and unknown policy values raise."""
    import pytest as _pytest

    from window_aggregation_spark.operators.text import (
        gopher_quality_pass_by_language,
        language_pred,
    )

    pl = (
        "grupa ludzi pracuje nad nowym projektem badawczym ktory zmienia "
        "sposob mysleniu miescie przyszlosci oraz daje wiele dobrych "
        "wynikow naukowych "
    ) * 4
    junk = " ".join(str(1111 * i) for i in range(60))
    bullets = "\n".join("- pozycja listy numer " + str(i) for i in range(60))
    stars = "★★★★ ☆☆☆ ★★★★★ " * 20  # symbol soup: letterless in ANY script
    rows = [(1, pl), (2, junk), (3, bullets), (4, stars)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert {
        r.doc_id: r.lp
        for r in df.select(
            "doc_id", language_pred("text").alias("lp")
        ).collect()
    } == {1: "und", 2: "und", 3: "und", 4: "und"}

    def verdicts(**kw):
        return {
            r.doc_id: r.qp
            for r in df.select(
                "doc_id",
                gopher_quality_pass_by_language("text", **kw).alias("qp"),
            ).collect()
        }

    assert verdicts() == {1: False, 2: False, 3: False, 4: False}
    # structural: clean unknown-language text passes; digit soup,
    # bullet spam, AND symbol soup (the \p{L} guard — a negated-ASCII
    # class wrongly admitted it, r12 review) still fail
    assert verdicts(und_policy="structural") == {
        1: True, 2: False, 3: False, 4: False,
    }
    # an explicit und override beats the policy
    assert verdicts(
        und_policy="structural",
        per_language_overrides={"und": {"max_words": 1}},
    ) == {1: False, 2: False, 3: False, 4: False}
    with _pytest.raises(ValueError, match="und_policy"):
        gopher_quality_pass_by_language("text", und_policy="lenient")


def test_min_nonnum_word_frac_mirrors_cross_engine(spark):
    """The script-agnostic junk guard must agree across engines when
    enabled (Java vs RE2 on \\p{L}, the Unicode-letter class — word 4's
    symbol-only spam must count as letterless in BOTH), and leave the
    published-rules oracle SQL byte-identical when disabled (the
    default 0.0)."""
    import duckdb as _duck
    import pandas as pd

    from window_aggregation_spark.operators.text import (
        quality_signals_gopher,
        quality_signals_gopher_oracle_sql,
    )

    assert "nonnum" not in quality_signals_gopher_oracle_sql()
    rules = {"min_nonnum_word_frac": 0.8, "min_alpha_word_frac": 0.0,
             "min_stopword_hits": 0}
    rows = [
        (1, " ".join(str(1111 * i) for i in range(60))),        # digit soup
        (2, ("grupa ludzi pracuje nad nowym projektem badawczym "
             "naukowych wynikow dobrych wiele daje oraz miescie ") * 7),
        (3, ("это новая наука и все люди хотят знать больше о мире "
             "вокруг нас сегодня и завтра утром ") * 5),         # non-ASCII
        (4, "★★★★ ☆☆☆ ★★★★★ " * 20),  # symbols: non-ASCII but letterless
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.quality_pass
        for r in quality_signals_gopher(df, rules=rules).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: False}
    con = _duck.connect()
    try:
        con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
        want = dict(
            con.execute(
                "SELECT doc_id, quality_pass FROM ("
                + quality_signals_gopher_oracle_sql("t", rules=rules)
                + ")"
            ).fetchall()
        )
    finally:
        con.close()
    assert {int(k): bool(v) for k, v in want.items()} == got


def test_sentence_array_ws_class_and_caps_ru_cross_engine(spark):
    """r11 self-review, pinned: (a) sentence canonicalization must use
    WS_RE, not \\s — Java's \\s matches \\x0B, RE2's does not, so a
    vertical tab inside a sentence would hash differently across
    engines (both now keep it as a token character); (b) the ru
    detector must lowercase before char scoring — an all-caps Russian
    document previously scored 0 and fell through to 'und'."""
    import duckdb as _duck
    import pandas as pd

    from window_aggregation_spark.operators.text import (
        language_id_oracle_expr,
        language_pred,
        sentence_array,
        sentence_array_duck,
    )

    docs = [
        (1, "Hello\x0bworld. Split\tacross\nspace. Done."),
        (2, "ЭТО ВАЖНО. ЧИТАЙТЕ ВНИМАТЕЛЬНО. ОНА НОВАЯ НАУКА О МИРЕ."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", sentence_array("text").alias("s")
        ).collect()
    }
    # \x0B survives as a character in both engines; \t and \n collapse
    assert got[1] == [
        "Hello\x0bworld.", "Split across space.", "Done.",
    ]
    con = _duck.connect()
    con.register("t", pd.DataFrame(docs, columns=["doc_id", "text"]))
    want = dict(
        con.execute(
            f"SELECT doc_id, {sentence_array_duck('text')} FROM t "
            "ORDER BY doc_id"
        ).fetchall()
    )
    assert {int(k): list(v) for k, v in want.items()} == got
    langs = {
        r.doc_id: r.lp
        for r in df.select(
            "doc_id", language_pred("text").alias("lp")
        ).collect()
    }
    assert langs[2] == "ru"
    oracle_langs = dict(
        con.execute(
            f"SELECT doc_id, {language_id_oracle_expr('text')} FROM t "
            "ORDER BY doc_id"
        ).fetchall()
    )
    assert oracle_langs[2] == "ru"
    assert oracle_langs[1] == langs[1]


def test_regex_stopword_scan_equals_token_filter_scoring(spark):
    """r13: the detector's Latin-language scoring moved from an
    interpreted per-token ``filter(toks, isin)`` pass to ONE
    ``regexp_count`` scan whose ``[a-z0-9]`` lookarounds re-create the
    tokenizer's boundaries. The two formulations must count
    IDENTICALLY for every Latin language on boundary-adversarial text
    — substring embeddings (athe/thex), underscore and punctuation
    boundaries (the tokenizer splits on ``_``, ``\\b`` would not),
    digit flanks (a1the2is has no 'the' token), repeated and adjacent
    stopwords, case folding, and the shared-word languages (de/nl both
    list 'de'... es/fr/pt too) — and for the char-based languages the
    class count must equal the old length-delta replace. DuckDB's
    independent list_filter oracle closes the triangle."""
    import duckdb as _duck
    import pandas as pd

    from pyspark.sql import functions as F
    from window_aggregation_spark.operators.text import (
        CHAR_BASED_LANGS,
        LANG_PRIORITY,
        STOPWORDS,
        _char_hits,
        _stopword_hits,
        _stopword_hits_text,
        language_id_oracle_expr,
        language_pred,
        tokens,
    )

    docs = [
        (1, "the the,the.the_the a-the athe thex a1the2is THE The"),
        (2, "a a a and an band randy of sofa of_x of9 of"),
        (3, "de het de-de een_van niet,op te zijn DE hetx"),
        (4, "le la de et les des est dans que pour le1 1le"),
        (5, "di che il la per un non sono una con diche"),
        (6, "de que o da do em um para com uma dequeo"),
        (7, None),
        (8, ""),
        (9, "это О е а И н все люди ЭТОГО"),
        (10, "的了是我不在人有他这 的的的"),
        (11, "のにはをたがでてとし のの"),
        (12, "der die das und ist von mit den ein zu derdie"),
        (13, "el la de que y en un por con los el_la"),
        (14, "\tthe\nand\fof\ris "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    text = F.coalesce(F.col("text"), F.lit(""))
    toks = tokens(text)
    lowered = F.lower(text)
    cols = []
    for lang in LANG_PRIORITY:
        if lang in CHAR_BASED_LANGS:
            old = F.length(lowered) - F.length(F.regexp_replace(
                lowered, "[" + "".join(STOPWORDS[lang]) + "]", ""))
            new = _char_hits(text, lang)
        else:
            old = _stopword_hits(toks, lang)
            new = _stopword_hits_text(lowered, lang)
        cols += [old.alias(f"old_{lang}"), new.alias(f"new_{lang}")]
    for row in df.select("doc_id", *cols).collect():
        for lang in LANG_PRIORITY:
            assert row[f"old_{lang}"] == row[f"new_{lang}"], (
                row["doc_id"], lang, row[f"old_{lang}"], row[f"new_{lang}"])

    # triangle leg: the composed verdict still matches the DuckDB oracle
    got = {r.doc_id: r.lp for r in df.select(
        "doc_id", language_pred("text").alias("lp")).collect()}
    con = _duck.connect()
    con.register("t", pd.DataFrame(docs, columns=["doc_id", "text"]))
    want = dict(con.execute(
        f"SELECT doc_id, {language_id_oracle_expr('text')} FROM t "
        "ORDER BY doc_id").fetchall())
    assert {int(k): v for k, v in want.items()} == got
