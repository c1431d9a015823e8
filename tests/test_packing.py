"""Sequence packing: offsets, boundary straddles, shard parallelism."""

from pyspark.sql import functions as F

from scholarmind_spark.operators.packing import pack_sequences, pack_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_offsets_and_straddle(spark):
    # one shard (shards=1) so the stream is a single concatenation:
    # doc 0: 3 tokens [0,3), doc 1: 4 tokens [3,7), doc 2: 2 tokens [7,9)
    df = _docs(spark, [(0, "a b c"), (1, "d e f g"), (2, "h i")])
    out = {r.doc_id: r for r in pack_sequences(
        df, context_tokens=4, shards=1
    ).collect()}
    assert (out[0].start_tok, out[0].seq_first, out[0].seq_last, out[0].offset_in_seq) == (0, 0, 0, 0)
    # doc 1 spans tokens 3..6 → straddles sequences 0 and 1
    assert (out[1].start_tok, out[1].seq_first, out[1].seq_last, out[1].offset_in_seq) == (3, 0, 1, 3)
    # doc 2 spans tokens 7..8 → sequences 1 and 2
    assert (out[2].start_tok, out[2].seq_first, out[2].seq_last) == (7, 1, 2)


def test_pack_exact_boundary_no_straddle(spark):
    # doc exactly filling a sequence must NOT leak into the next one
    df = _docs(spark, [(0, "a b c d"), (1, "e f")])
    out = {r.doc_id: r for r in pack_sequences(
        df, context_tokens=4, shards=1
    ).collect()}
    assert (out[0].seq_first, out[0].seq_last) == (0, 0)
    assert (out[1].seq_first, out[1].offset_in_seq) == (1, 0)


def test_pack_shards_are_independent(spark):
    # with 2 shards, even/odd ids pack independently from offset 0
    df = _docs(spark, [(0, "a b"), (1, "c d e"), (2, "f"), (3, "g h")])
    out = {r.doc_id: r for r in pack_sequences(
        df, context_tokens=4, shards=2
    ).collect()}
    assert out[0].shard == 0 and out[1].shard == 1
    assert out[0].start_tok == 0 and out[1].start_tok == 0
    assert out[2].start_tok == 2  # after doc 0 in shard 0
    assert out[3].start_tok == 3  # after doc 1 in shard 1


def test_pack_window_is_shard_partitioned(spark):
    """The running offset must come from a shard-PARTITIONED window — a
    global-order window would funnel the corpus through one task."""
    df = _docs(spark, [(i, "a b c") for i in range(64)]).repartition(8)
    plan = pack_sequences(df, shards=8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_pack_stats_utilization(spark):
    df = _docs(spark, [(0, "a b c"), (2, "d e f g h")])  # one shard (even ids), 8 tokens
    s = pack_stats(pack_sequences(df, context_tokens=4, shards=1), context_tokens=4)
    row = s.collect()[0]
    assert (row.n_docs, row.total_tokens, row.n_sequences) == (2, 8, 2)
    assert row.pad_fraction == 0.0
