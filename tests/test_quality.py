"""Gopher quality rule battery (operators/quality): each of the seven
rules tripped by a purpose-built document, plus the integer-cleared
threshold boundaries."""

from __future__ import annotations

import pytest

from scholarmind_spark.operators.quality import gopher_quality_flags

GOOD = (
    "The results of this study show that models trained with curated "
    "data have better downstream quality and that filtering rules be "
    "applied consistently to each of the corpus slices with care . "
) * 3  # ~90 words, mean len in range, stopwords present


def _flags(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_quality_flags(df, **kw).collect()[0]


def test_good_document_keeps(spark):
    r = _flags(spark, GOOD)
    assert r.keep, r
    assert all(
        getattr(r, f)
        for f in [
            "f_word_count",
            "f_mean_word_len",
            "f_symbol",
            "f_bullet",
            "f_ellipsis",
            "f_alpha",
            "f_stop",
        ]
    )


def test_word_count_bounds(spark):
    r = _flags(spark, "the of and that be short text with")
    assert not r.f_word_count and not r.keep  # 8 words < 50
    # boundary: exactly min_words passes (>=)
    text = " ".join(["the", "of", "and", "have", "with"] * 10)  # 50 words
    assert _flags(spark, text).f_word_count


def test_mean_word_length_rule(spark):
    # 1-char words -> mean 1 < 3: 3*n <= chars fails
    assert not _flags(spark, " ".join(["a"] * 60)).f_mean_word_len
    # 12-char words -> mean 12 > 10 fails
    assert not _flags(spark, " ".join(["abcdefghijkl"] * 60)).f_mean_word_len
    # exactly 3 chars passes (inclusive bound)
    assert _flags(spark, " ".join(["abc"] * 60)).f_mean_word_len


def test_symbol_word_rule(spark):
    # 10% of 60 words symbol-ish is NOT < 0.1 (strict)
    words = ["word"] * 54 + ["#tag"] * 6
    assert not _flags(spark, " ".join(words)).f_symbol
    words = ["word"] * 55 + ["..."] * 5
    assert _flags(spark, " ".join(words)).f_symbol


def test_symbol_rule_counts_occurrences_not_words(spark):
    # Gopher's symbol-to-word ratio counts each '#'/'...' OCCURRENCE: one
    # word carrying 7 '#'s contributes 7 hits, so 7/60 > 0.1 trips the
    # rule even though only 1/60 words contains a symbol (the word-level
    # count would keep it).
    words = ["word"] * 59 + ["#######"]
    assert not _flags(spark, " ".join(words)).f_symbol
    # occurrence parity check: '....' counts ONE non-overlapping '...'
    words = ["word"] * 55 + ["...."] * 5  # 5 occurrences → 50 < 60 keeps
    assert _flags(spark, " ".join(words)).f_symbol


def test_bullet_and_ellipsis_line_rules(spark):
    bullets = "\n".join(["- item %d" % i for i in range(9)] + ["plain"])
    assert not _flags(spark, bullets).f_bullet  # 9/10 not < 0.9
    ell = "\n".join(["line %d ..." % i for i in range(3)] + ["x"] * 7)
    assert not _flags(spark, ell).f_ellipsis  # 3/10 not < 0.3
    ell_ok = "\n".join(["line ..."] + ["x"] * 9)  # 1/10 < 0.3
    assert _flags(spark, ell_ok).f_ellipsis
    # unicode ellipsis counts too
    assert not _flags(spark, "\n".join(["a …"] * 10)).f_ellipsis


def test_alpha_word_rule(spark):
    words = ["word"] * 48 + ["1234"] * 12  # 80% exactly -> passes (>=)
    assert _flags(spark, " ".join(words)).f_alpha
    words = ["word"] * 47 + ["1234"] * 13
    assert not _flags(spark, " ".join(words)).f_alpha


def test_stopword_rule(spark):
    # only one distinct Gopher stopword present -> fails
    text = " ".join(["the"] * 25 + ["lorem"] * 30)
    assert not _flags(spark, text).f_stop
    text = " ".join(["the", "with"] + ["lorem"] * 55)
    assert _flags(spark, text).f_stop


def test_empty_text_drops_not_crashes(spark):
    r = _flags(spark, "")
    assert not r.keep and r.n_words == 0


def test_repetition_top_ngram_flags(spark):
    from scholarmind_spark.operators.quality import gopher_repetition_stats

    # "spam ham " * 30: the top bigram "spam ham" covers nearly all chars
    spammy = " ".join(["spam ham"] * 30)
    clean = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, spammy), (2, clean), (3, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_repetition_stats(df).collect()}
    assert not rows[1].keep
    assert rows[1].top2_micro > 200_000  # > 20% of chars
    assert rows[2].keep
    assert rows[2].dup5_micro == 0
    # empty doc: zero metrics, kept
    assert rows[3].keep and rows[3].top2_micro == 0


def test_repetition_duplicate_ngram_fraction(spark):
    from scholarmind_spark.operators.quality import gopher_repetition_stats

    # a 6-word phrase repeated twice inside otherwise-unique text: its
    # 5-grams occur twice each -> dup5 fraction > 0; with 250 unique
    # filler words the ~130 duplicated chars stay under the 15% threshold
    phrase = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"u{i}" for i in range(250))
    text = f"{phrase} {filler} {phrase}"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_repetition_stats(df).collect()[0]
    assert r.dup5_micro > 0 and r.dup6_micro > 0
    assert r.keep
    # the short-filler variant trips the duplicate-5-gram threshold
    short = f"{phrase} {' '.join(f'u{i}' for i in range(80))} {phrase}"
    df2 = spark.createDataFrame([(1, short)], "doc_id long, text string")
    assert not gopher_repetition_stats(df2).collect()[0].keep


def test_repetition_matches_duckdb_twin(spark, tmp_path):
    import duckdb

    from scholarmind_spark.operators.quality import (
        gopher_repetition_stats,
        gopher_repetition_stats_sql,
    )

    rows = [
        (1, " ".join(["spam ham"] * 20)),
        (2, " ".join(f"w{i}" for i in range(40))),
        (3, "tiny"),
        (4, ""),
        (5, "a b a b a b a b c d e f g h i j"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(p)
    got = sorted(tuple(r) for r in gopher_repetition_stats(df).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    want = sorted(con.sql(gopher_repetition_stats_sql("documents")).fetchall())
    assert got == want


def test_gopher_keep_requires_both_batteries(spark):
    from scholarmind_spark.operators.quality import gopher_keep

    # GOOD passes the rule battery but is "... " * 3 of the same sentence
    # — its top 2-gram/dup 5-gram char fractions blow every repetition
    # threshold, so the combined verdict must be False while keep_rules
    # stays True.
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    r = gopher_keep(df).collect()[0]
    assert r.keep_rules and not r.keep_repetition and not r.keep
