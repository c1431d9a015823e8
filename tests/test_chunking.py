"""Chunking boundary semantics: overlap, tail windows, short docs."""

from __future__ import annotations

import pytest

from scholarmind_spark.operators.chunking import chunk_documents


def test_overlap_and_tail(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    # step 3, bound n-overlap-1=8: starts 0,3,6 — window 2 already reaches
    # the end, so no trailing subset chunk is emitted
    got = [(r.chunk_id, r.n_tokens, r.chunk_text) for r in rows]
    assert got == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
    ]


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 2 and rows[0].chunk_text == "a b"


def test_invalid_overlap_rejected(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_no_redundant_tail_chunk(spark):
    """step < n <= chunk_tokens used to emit a final chunk that was a pure
    subset of the first (r6 review finding): 25 tokens at defaults emitted
    chunk 0 = the whole doc AND chunk 1 = its last token."""
    words = " ".join(f"t{i}" for i in range(25))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 25

    # a doc ONE token past the first window still gets the overlap tail
    words33 = " ".join(f"t{i}" for i in range(33))
    df = spark.createDataFrame([(1, words33)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    assert [(r.chunk_id, r.n_tokens) for r in rows] == [(0, 32), (1, 9)]
