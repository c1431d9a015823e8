"""Duplicate-span detection (ExactSubstr semantics at token
granularity): spans fire on the second occurrence anywhere, abutting
covered intervals merge maximally, short docs and singletons stay
silent."""

from __future__ import annotations

from scholarmind_spark.operators.dupspans import duplicate_spans

BANNER_A = "all rights reserved contact us"     # 5 words
BANNER_B = "subscribe to our newsletter today"  # 5 words


def _run(spark, rows, k=5, min_count=2):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, k=k, min_count=min_count)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.n_words)
        )
    return {k2: sorted(v) for k2, v in got.items()}


def test_cross_doc_banner_spans(spark):
    rows = [
        (0, f"{BANNER_B} alpha beta gamma delta epsilon"),
        (1, f"{BANNER_B} zeta eta theta iota kappa"),
        (2, "completely unrelated words that never repeat anywhere else"),
    ]
    got = _run(spark, rows)
    assert got == {0: [(0, 4, 5)], 1: [(0, 4, 5)]}


def test_adjacent_duplicated_regions_merge(spark):
    # doc 0 carries A then B back-to-back; A duplicated via doc 1, B via
    # doc 2 — different sources, but the covered intervals abut, so doc
    # 0 reports ONE maximal 10-word span (the scrub semantics)
    rows = [
        (0, f"{BANNER_A} {BANNER_B} and then some closing words"),
        (1, f"{BANNER_A} padding words to finish the line"),
        (2, f"{BANNER_B} other padding words to finish it"),
    ]
    got = _run(spark, rows)
    assert got[0] == [(0, 9, 10)]
    assert got[1] == [(0, 4, 5)] and got[2] == [(0, 4, 5)]


def test_within_doc_repeat_counts(spark):
    # a 6-token phrase repeated inside ONE doc duplicates itself — the
    # suffix-array semantics Lee et al. use (no other doc involved)
    phrase = "one two three four five six"
    rows = [
        (0, f"{phrase} filler filler {phrase}"),
        (1, "nothing shared with anything else at all here"),
    ]
    got = _run(spark, rows)
    assert 0 in got and 1 not in got
    spans = got[0]
    # both occurrences covered: words 0-5 and 8-13
    assert spans == [(0, 5, 6), (8, 13, 6)]


def test_interior_span_not_anchored_at_doc_start(spark):
    rows = [
        (0, f"lead in words then {BANNER_B} trailing words here"),
        (1, f"other opening stuff {BANNER_B} and different tail"),
    ]
    got = _run(spark, rows)
    assert got[0] == [(4, 8, 5)]
    assert got[1] == [(3, 7, 5)]


def test_min_count_threshold_and_short_docs(spark):
    rows = [
        (0, f"{BANNER_B} alpha beta gamma"),
        (1, f"{BANNER_B} delta epsilon zeta"),
        (2, "tiny doc"),  # shorter than k: no shingles, no crash
    ]
    # raising min_count above the occurrence count silences everything
    assert _run(spark, rows, min_count=3) == {}
    got = _run(spark, rows, min_count=2)
    assert set(got) == {0, 1}


def test_scrub_removes_spans_keeps_rows(spark):
    from scholarmind_spark.operators.dupspans import scrub_duplicate_spans

    rows = [
        (0, f"{BANNER_B} the quick brown fox jumps over"),
        (1, f"{BANNER_B} something entirely different here now ok"),
        (2, "untouched words that never repeat anywhere else at all"),
        (3, f"{BANNER_B} extra {BANNER_B}"),  # fully duplicated + self-repeat
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in scrub_duplicate_spans(df).collect()}
    assert got[0] == "the quick brown fox jumps over"
    assert got[1] == "something entirely different here now ok"
    assert got[2] == rows[2][1]
    # doc 3: banner twice → both occurrences + the bridging 'extra'
    # shingle context... the banners duplicate, 'extra' sits between two
    # covered regions only if its own shingles are duplicated — they are
    # not, but the covering intervals [0,4] and [6,10] leave word 5
    # ('extra') alive
    assert got[3] == "extra"
    # every row survives, including fully-scrubbed ones
    assert set(got) == {0, 1, 2, 3}


def test_scrub_noop_on_dup_free_corpus(spark):
    from scholarmind_spark.operators.dupspans import scrub_duplicate_spans

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "eta theta iota kappa lambda mu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in scrub_duplicate_spans(df).collect()}
    assert got == {0: rows[0][1], 1: rows[1][1]}


def test_contamination_spans_against_benchmark(spark):
    from scholarmind_spark.operators.dupspans import contamination_spans
    from scholarmind_spark.util import release_caches

    corpus = spark.createDataFrame(
        [
            # contains an exact 6-word benchmark passage mid-document
            (0, "intro words here what is the capital of france asked nobody"),
            (1, "clean document with entirely original content all the way through"),
            # contains the benchmark passage at the start
            (2, "what is the capital of france and other trivia"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the capital of france")], "doc_id long, text string"
    )
    out = contamination_spans(corpus, bench, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    release_caches(out)
    # doc 0: the 6-word passage occupies words 3..8 (two overlapping
    # 5-shingles merge); doc 2: words 0..5; doc 1 clean
    assert got == {0: [(3, 8)], 2: [(0, 5)]}
    # corpus-internal duplication alone must NOT fire (docs share no
    # 5-grams with each other here) — the hot set is benchmark-only


def test_contamination_spans_ignores_corpus_internal_dups(spark):
    from scholarmind_spark.operators.dupspans import contamination_spans
    from scholarmind_spark.util import release_caches

    dup = "repeated corpus phrase appears twice here"
    corpus = spark.createDataFrame(
        [(0, dup + " tail one"), (1, dup + " tail two")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "totally unrelated benchmark question text")],
        "doc_id long, text string",
    )
    out = contamination_spans(corpus, bench, k=5)
    n = out.count()
    release_caches(out)
    assert n == 0  # cross-doc corpus dup is duplicate_spans' job, not this
