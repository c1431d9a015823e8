"""Shared plan-shaping helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the scan is under-partitioned.

    A small local parquet file arrives as ONE input split, which serializes
    CPU-heavy per-row work (shingling, hashing, Python UDF stages) onto a
    single core.  On a real cluster a 100 TB scan already has thousands of
    splits and this is a no-op — the guard never touches an adequately
    partitioned input."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df
