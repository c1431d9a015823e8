"""Bucketed-table sink: pre-shuffle once at write time so repeated joins
and aggregations on the bucket key run with NO exchange at read time.

At 100 TB the fact tables are written once and joined daily; paying one
shuffle at ingest (``bucketBy``) and sorting within buckets
(``sortBy``) turns every subsequent equi-join on the key into a
zero-shuffle sort-merge join (both sides arrive co-partitioned and
co-sorted).  ``tests/test_bucketed.py`` asserts the join plan contains no
Exchange.

Uses Spark's native (Hive-less) bucketing via ``saveAsTable`` — bucketed
reads need table metadata, so this sink works through the session catalog
rather than bare paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table."""
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a fresh metastore can orphan a previous run's managed location, which
    # saveAsTable then refuses to reuse — clear local leftovers
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith(("file:", "/")):
        import shutil

        local = warehouse.removeprefix("file:")
        # managed location is <warehouse>/<db>.db/<table> for qualified
        # names and <warehouse>/<table> for unqualified-in-default — the
        # old f"{table.lower()}" path silently missed 'db.table' orphans
        if "." in table:
            db, _, name = table.lower().rpartition(".")
            rel = f"{db}.db/{name}"
        else:
            rel = table.lower()
        shutil.rmtree(f"{local}/{rel}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
