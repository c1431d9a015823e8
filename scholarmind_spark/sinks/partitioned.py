"""Hive-partitioned parquet sink: directory-per-value layout so reads with
a partition-key predicate never open the other partitions' files.

This is the data-lake layout for the 100 TB corpus: partition by a
low-cardinality routing column (event type, language, source, ingest
date), and Catalyst turns an equality/IN filter on that column into
``PartitionFilters`` at the scan — pruning whole directories from the
file listing instead of relying on row-group statistics.  The pruning is
asserted in ``tests/test_partitioned.py`` by reading the plan.

Guardrails at scale:

- partition columns must be LOW cardinality (≤ a few thousand values) —
  a per-user partition key creates millions of directories and kills the
  file listing; high-cardinality pruning belongs to bucketing
  (``sinks/bucketed.py``) or row-group sort (``sort_within``).
- ``repartition(*cols)`` before the write so each partition directory is
  written by the tasks owning that key — without it every task writes a
  file into every directory (tasks × partitions small files).
- ``sort_within`` optionally sorts rows inside each file by a secondary
  column, tightening parquet row-group min/max bounds so non-partition
  predicates skip row groups too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    sort_within: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by`` directories."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    out = df.repartition(*[df[k] for k in keys])
    if sort_within:
        s = [sort_within] if isinstance(sort_within, str) else list(sort_within)
        # lead with the partition keys: the parquet writer requires rows
        # ordered by partition columns and would otherwise insert its own
        # (non-stable) sort, destroying the secondary order
        out = out.sortWithinPartitions(*keys, *s)
    out.write.mode(mode).partitionBy(*keys).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset; partition-key filters applied by the
    caller prune directories (``PartitionFilters`` in the scan node)."""
    return spark.read.parquet(path)
