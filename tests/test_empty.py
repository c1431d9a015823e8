"""Empty-input hardening: core operators must return empty results (with
the right schema), not throw, when a source or side is empty — at 100 TB
an empty partition, an empty increment, or a filter that matches nothing
is routine, not exceptional."""

from __future__ import annotations

from pyspark.sql import types as T


def _empty_docs(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return spark.createDataFrame([], schema)


def test_neardup_ops_on_empty_corpus(spark):
    from scholarmind_spark.operators.neardup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    empty = _empty_docs(spark)
    assert ngram_jaccard_pairs(empty).count() == 0
    assert minhash_lsh_pairs(empty).count() == 0
    assert simhash_pairs(empty).count() == 0


def test_word_ops_on_empty_corpus(spark):
    from scholarmind_spark.operators.textstats import doc_top_terms, word_repetition

    empty = _empty_docs(spark)
    assert word_repetition(empty).count() == 0
    assert doc_top_terms(empty).count() == 0


def test_merge_with_empty_sides(spark):
    from scholarmind_spark.operators.merge import merge_upsert

    schema = "id long, val string, version int"
    empty = spark.createDataFrame([], schema)
    data = spark.createDataFrame([(1, "a", 1)], schema)
    assert merge_upsert(empty, data, "id", version_col="version").count() == 1
    assert merge_upsert(data, empty, "id", version_col="version").count() == 1
    assert merge_upsert(empty, empty, "id", version_col="version").count() == 0


def test_decontam_with_empty_benchmark(spark):
    from scholarmind_spark.operators.decontam import decontamination_overlap

    corpus = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    assert decontamination_overlap(corpus, _empty_docs(spark)).count() == 0


def test_profile_empty_table(spark):
    from scholarmind_spark.operators.profile import profile_table

    rows = {r.col_name: r for r in profile_table(_empty_docs(spark)).collect()}
    assert set(rows) == {"doc_id", "text"}
    assert rows["doc_id"].n_distinct == 0 and rows["doc_id"].min_val is None
