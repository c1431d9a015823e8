"""Small-file compaction for parquet datasets.

Streaming sinks and per-increment merges accumulate small files; at
100 TB the file listing and per-file open cost dominate reads long
before the data does (the classic small-files problem).  Compaction
rewrites a dataset into ~``target_bytes``-sized files: size from the
current on-disk footprint (driver-side listing, no data pass), then one
``coalesce`` write — coalesce, not repartition, so existing partitions
are concatenated WITHOUT a shuffle.  The rewrite lands in a staging
directory swapped in by rename, so readers never observe a half-written
dataset.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite ``path`` into ``ceil(size/target_bytes)`` files; returns the
    resulting file count.

    Refuses hive-partitioned datasets: a flat rewrite would silently
    DROP the directory layout (and with it partition pruning) — compact
    those per partition directory instead."""
    if any(
        "=" in d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
    ):
        raise ValueError(
            f"{path} is hive-partitioned; compact each partition directory "
            "separately to preserve the layout (a flat rewrite drops pruning)"
        )
    n_files = max(1, -(-_dir_bytes(path) // target_bytes))
    df = spark.read.parquet(path)
    if os.path.isdir(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            "refusing to compact a streaming-sink dataset: rewriting the "
            "directory would destroy the _spark_metadata commit log and "
            "drop files committed by concurrent microbatches — stop the "
            "stream and write through a batch copy instead"
        )
    staging = f"{path}.compacting"
    df.coalesce(n_files).write.mode("overwrite").parquet(staging)
    # two renames, not rmtree-then-rename: the old rmtree left a window as
    # wide as the directory delete during which readers saw NO dataset at
    # all.  Each rename is atomic; the only remaining gap is the instant
    # between them, and on failure the original is restored.
    old = f"{path}.old-{os.getpid()}"
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except BaseException:
        os.rename(old, path)
        raise
    shutil.rmtree(old)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
