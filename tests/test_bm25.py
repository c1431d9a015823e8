"""BM25 top-k retrieval (operators/bm25)."""

from __future__ import annotations

from scholarmind_spark.operators.bm25 import bm25_topk


def test_bm25_ranks_by_relevance(spark):
    df = spark.createDataFrame(
        [
            (1, "spark join spark join spark"),  # dense in query terms
            (2, "spark filter scan table window"),  # one hit each of two terms
            (3, "filter scan table row column"),  # no query terms
            (4, "join padding padding padding padding padding padding"),  # long, 1 hit
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(df, ["spark", "join"], k=10).collect()
    ids = [r.doc_id for r in rows]
    # doc 3 has no query terms and must be absent entirely
    assert 3 not in ids
    # densest doc wins; length normalization pushes the padded doc below
    # the short two-term doc
    assert ids[0] == 1
    assert rows[0].rank == 1
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_case_insensitive_and_k_cap(spark):
    df = spark.createDataFrame(
        [(i, "SPARK data") for i in range(10)], "doc_id long, text string"
    )
    rows = bm25_topk(df, ["Spark"], k=3).collect()
    assert len(rows) == 3
    # equal scores -> ascending-id tiebreak
    assert [r.doc_id for r in rows] == [0, 1, 2]
