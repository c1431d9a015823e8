"""JSONL corpus source — the de-facto interchange format of training-data
pipelines (one JSON document per line).

Scale posture: ``spark.read.json`` with an EXPLICIT schema — schema
inference scans the whole input once before the real read (a full extra
pass over 100 TB) and silently widens types on dirty data.  Malformed
lines are kept, not dropped: PERMISSIVE mode + ``columnNameOfCorruptRecord``
routes them to a ``_corrupt_record`` column so a quality gate can count and
quarantine them (dropping bad lines silently is how training corpora rot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = True,
    cache_for_count: bool = False,
) -> DataFrame:
    """Schema-enforced JSONL read; corrupt lines surface in
    ``_corrupt_record`` when ``keep_corrupt`` (else they are dropped).

    ``cache_for_count``: a downstream query that prunes EVERY data column
    (a bare ``count()``) from the quarantine-filtered read trips
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN, whose documented
    workaround is materializing the parse first.  Only such callers
    should pass True — the cache materializes the whole corpus into
    executor storage, a real cost at 100 TB, so the ordinary projecting
    read must not pay it."""
    full = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        # explicit charset: the default follows the JVM file.encoding, so a
        # driver running under LANG=C would decode non-ASCII bytes differently
        # than the writer encoded them
        .option("encoding", "UTF-8")
        .option("lineSep", "\n")
        .json(path)
    )
    if not keep_corrupt:
        if cache_for_count:
            # cache attached for release_caches()
            from scholarmind_spark.util import attach_caches

            df = df.cache()
            out = df.filter(F.col("_corrupt_record").isNull()).drop(
                "_corrupt_record"
            )
            return attach_caches(out, [df])
        return df.filter(F.col("_corrupt_record").isNull()).drop(
            "_corrupt_record"
        )
    return df


def corrupt_line_stats(df: DataFrame) -> DataFrame:
    """Quality gate companion: counts of clean vs corrupt lines.

    Caches the input first: Spark refuses queries whose referenced columns
    are ONLY the internal corrupt-record column on a raw scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented
    workaround is materializing before the aggregate.  (Caching a
    corrupt-column-only projection would itself trip the restriction —
    the rule fires at analysis, before the cache materializes — so the
    full rows are cached; the cache is attached for
    ``release_caches()`` instead of leaking for the session.)"""
    from scholarmind_spark.util import attach_caches

    df = df.cache()
    out = df.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)).alias(
            "n_corrupt"
        ),
    )
    return attach_caches(out, [df])


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Engine-native JSONL sink (one JSON object per line, partitioned
    output files — downstream trainers shard-read them directly)."""
    # explicit charset + line separator: never inherit the JVM default
    # (file.encoding varies with the host locale and silently mangles
    # non-ASCII text on the round-trip)
    w = df.write.mode("overwrite").option("encoding", "UTF-8").option("lineSep", "\n")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
