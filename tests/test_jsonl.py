"""JSONL source/sink: schema enforcement and corrupt-line quarantine."""

from pyspark.sql import types as T

from scholarmind_spark.sources.jsonl import corrupt_line_stats, read_jsonl, write_jsonl

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
)


def test_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"id": 1, "text": "good"}\n'
        '{"id": 2, "text": "also good"}\n'
        "{broken json!!\n"
        '{"id": "not-a-long", "text": "type mismatch"}\n'
    )
    df = read_jsonl(spark, str(p), SCHEMA)
    stats = corrupt_line_stats(df).collect()[0]
    assert stats.n_lines == 4 and stats.n_corrupt == 2
    clean = read_jsonl(spark, str(p), SCHEMA, keep_corrupt=False)
    assert sorted(r.id for r in clean.collect()) == [1, 2]


def test_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 'uni"code\nand\ttabs'), (2, "中文 текст")], "id long, text string"
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, SCHEMA, keep_corrupt=False)
    assert sorted((r.id, r.text) for r in back.collect()) == sorted(
        (r.id, r.text) for r in df.collect()
    )


def test_bare_count_requires_cache_for_count(spark, tmp_path):
    # A bare count() on the quarantine-filtered read prunes every data
    # column, leaving only _corrupt_record referenced at the scan —
    # Spark refuses that (QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the
    # parse is materialized first, which cache_for_count opts into.
    p = tmp_path / "corpus.jsonl"
    p.write_text('{"id": 1, "text": "a"}\n{broken\n{"id": 2, "text": "b"}\n')
    counted = read_jsonl(
        spark, str(p), SCHEMA, keep_corrupt=False, cache_for_count=True
    )
    assert counted.count() == 2
    # the default (uncached) filtered read still projects fine
    plain = read_jsonl(spark, str(p), SCHEMA, keep_corrupt=False)
    assert sorted(r.id for r in plain.select("id").collect()) == [1, 2]
