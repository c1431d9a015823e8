"""C4-style repeated-span removal (operators/boilerplate)."""

from __future__ import annotations

from scholarmind_spark.operators.boilerplate import (
    repeated_span_stats,
    scrub_repeated_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_removes_cross_doc_spans_preserving_order(spark):
    # span_words=2: "ad one" appears in all three docs; unique content stays
    rows = [
        (1, "ad one alpha beta gamma delta"),
        (2, "ad one epsilon zeta eta theta"),
        (3, "ad one iota kappa"),
    ]
    out = {
        r.doc_id: r.text
        for r in scrub_repeated_spans(
            _df(spark, rows), span_words=2, min_docs=3
        ).collect()
    }
    assert out == {
        1: "alpha beta gamma delta",
        2: "epsilon zeta eta theta",
        3: "iota kappa",
    }


def test_scrub_keeps_fully_scrubbed_docs_as_empty(spark):
    rows = [(1, "ad one"), (2, "ad one"), (3, "ad one real content here")]
    out = {
        r.doc_id: r.text
        for r in scrub_repeated_spans(
            _df(spark, rows), span_words=2, min_docs=3
        ).collect()
    }
    # no rows dropped; docs that were pure boilerplate survive empty
    assert out == {1: "", 2: "", 3: "real content here"}


def test_scrub_below_threshold_is_identity(spark):
    rows = [(1, "alpha beta gamma"), (2, "delta epsilon zeta")]
    out = {
        r.doc_id: r.text
        for r in scrub_repeated_spans(
            _df(spark, rows), span_words=2, min_docs=2
        ).collect()
    }
    assert out == dict(rows)


def test_repeated_span_stats_counts(spark):
    rows = [
        (1, "ad one alpha beta"),
        (2, "ad one alpha beta"),
        (3, "ad one other words"),
    ]
    stats = {
        r.span: (r.n_docs, r.n_occurrences)
        for r in repeated_span_stats(
            _df(spark, rows), span_words=2, min_docs=2
        ).collect()
    }
    assert stats == {"ad one": (3, 3), "alpha beta": (2, 2)}


def test_scrub_partial_tail_span(spark):
    # 5 words with span_words=2 -> spans "a b","c d","e"; the partial tail
    # is a first-class span and is scrubbed like any other
    rows = [(1, "a b c d e"), (2, "x y z w e"), (3, "p q r s e")]
    out = {
        r.doc_id: r.text
        for r in scrub_repeated_spans(
            _df(spark, rows), span_words=2, min_docs=3
        ).collect()
    }
    assert out == {1: "a b c d", 2: "x y z w", 3: "p q r s"}


def test_char_entropy_known_values(spark):
    import math

    from scholarmind_spark.operators.textstats import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_chars, r.entropy_micro) for r in char_entropy(df).collect()}
    assert got[1] == (4, 0)  # single-symbol text: zero entropy
    assert got[2] == (4, round(math.log(2) * 1e6))  # two equiprobable symbols
    assert got[3] == (4, round(math.log(4) * 1e6))  # uniform over 4 symbols
