"""Partitioned parquet sink: directory pruning and small-file discipline."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scholarmind_spark.sinks.partitioned import read_partitioned, write_partitioned


def _plan(df) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return e.select("event_id", "user_id", "event_type", "value")


def test_partition_filter_prunes_directories(spark, tmp_path):
    e = _events(spark)
    path = str(tmp_path / "events_by_type")
    write_partitioned(e, path, "event_type", sort_within="user_id")

    r = read_partitioned(spark, path).filter(F.col("event_type") == "click")
    plan = _plan(r)
    # the equality predicate must land in PartitionFilters (directory
    # pruning), NOT in PushedFilters (row-group evaluation inside files)
    part_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in part_line
    # no data-side filter remains — the scan has no PushedFilters line at
    # all (the predicate is resolved entirely from directory names)
    pushed_line = next(
        (l for l in plan.splitlines() if "PushedFilters" in l), ""
    )
    assert "event_type" not in pushed_line

    assert r.count() == e.filter(F.col("event_type") == "click").count()


def test_one_file_per_partition_directory(spark, tmp_path):
    # repartition(key) before the write: each directory is produced by the
    # single task owning its key — no tasks × partitions file explosion
    e = _events(spark)
    path = str(tmp_path / "events_by_type")
    write_partitioned(e, path, "event_type")
    for d in os.listdir(path):
        if not d.startswith("event_type="):
            continue
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: {files}"


def test_sort_within_tightens_row_groups(spark, tmp_path):
    e = _events(spark)
    path = str(tmp_path / "events_sorted")
    write_partitioned(e, path, "event_type", sort_within="user_id")
    one = [
        os.path.join(path, d, f)
        for d in os.listdir(path)
        if d.startswith("event_type=")
        for f in os.listdir(os.path.join(path, d))
        if f.endswith(".parquet")
    ][0]
    import pyarrow.parquet as pq

    t = pq.read_table(one, columns=["user_id"])
    vals = t.column("user_id").to_pylist()
    assert vals == sorted(vals)
