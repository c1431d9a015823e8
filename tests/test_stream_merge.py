"""Streaming incremental merge: microbatches upsert into a parquet snapshot."""

from __future__ import annotations

from pyspark.sql import types as T

from scholarmind_spark.streaming import stream_merge_to_snapshot

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("version", T.LongType()),
    ]
)


def _drain(spark, src, snap, ck):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_merge_to_snapshot(
        stream, snap, keys=["id"], version_col="version", checkpoint=ck
    )
    q.awaitTermination()


def test_two_increments_upsert(spark, tmp_path):
    src = str(tmp_path / "src")
    snap = str(tmp_path / "snap")
    ck = str(tmp_path / "ck")

    inc1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], SCHEMA)
    inc1.write.mode("append").parquet(src)
    _drain(spark, src, snap, ck)
    got = {r.id: (r.val, r.version) for r in spark.read.parquet(snap).collect()}
    assert got == {1: ("a", 1), 2: ("b", 1)}

    # second increment: update id=2, insert id=3; the checkpoint makes the
    # second drain process ONLY the new file
    inc2 = spark.createDataFrame([(2, "B", 2), (3, "C", 2)], SCHEMA)
    inc2.write.mode("append").parquet(src)
    _drain(spark, src, snap, ck)
    got = {r.id: (r.val, r.version) for r in spark.read.parquet(snap).collect()}
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("C", 2)}


def test_swap_crash_recovery(spark, tmp_path):
    """A crash between 'move current aside' and 'move staging in' leaves
    only the .old directory; the next batch must restore it and merge on
    top — the r6-review finding was that rmtree-then-rename lost the whole
    snapshot at that failure point and rebuilt from one microbatch."""
    import os

    src = str(tmp_path / "src")
    snap = str(tmp_path / "snap")
    ck = str(tmp_path / "ck")

    inc1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], SCHEMA)
    inc1.write.mode("append").parquet(src)
    _drain(spark, src, snap, ck)

    # simulate dying between the two renames: snapshot moved aside, new
    # one never moved in
    os.rename(snap, snap + ".old")

    inc2 = spark.createDataFrame([(2, "B", 2), (3, "C", 2)], SCHEMA)
    inc2.write.mode("append").parquet(src)
    _drain(spark, src, snap, ck)
    got = {r.id: (r.val, r.version) for r in spark.read.parquet(snap).collect()}
    # id=1 survived the interrupted swap; id=2 updated; id=3 inserted
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("C", 2)}
    assert not os.path.isdir(snap + ".old")
