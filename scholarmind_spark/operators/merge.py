"""Incremental merge (upsert) of an update batch into a snapshot.

The literature pipeline re-ingests sources incrementally: a nightly batch
carries new and revised records that must replace their snapshot rows by
key while untouched rows survive (reference semantics: re-running the
pipeline over an amended export replaces matching records —
/root/reference/main.py dedup-after-union flow).  Spark-first shape:
``unionByName`` the two sides and keep one winner per key with a single
row_number window — one shuffle on the merge key, no join, no driver
loop.  At 100 TB the snapshot side dominates; the shuffle partitions by
key so AQE sizes the reduce side, and the output can be written straight
back partitioned/bucketed (``sinks/``) for the next increment.

Ties (same key, same version) break toward the UPDATE side via a
side-rank column, matching MERGE semantics where the incoming row wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    snapshot: DataFrame,
    updates: DataFrame,
    keys: str | list[str],
    version_col: str | None = None,
) -> DataFrame:
    """One surviving row per key: the updates row unless the snapshot's
    ``version_col`` is strictly higher (out-of-order increments)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    s = snapshot.withColumn("__side", F.lit(1))
    u = updates.withColumn("__side", F.lit(0))
    both = s.unionByName(u)
    order = []
    if version_col:
        order.append(F.desc(version_col))
    order += [F.asc("__side")]  # updates (0) beat snapshot (1) on version tie
    w = Window.partitionBy(*ks).orderBy(*order)
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__side")
    )


def merge_upsert_sql(
    snapshot_sql: str, updates_sql: str, keys: list[str], version_col: str | None = None
) -> str:
    """DuckDB twin: same union + one-winner-per-key window."""
    ks = ", ".join(keys)
    order = (f"{version_col} DESC, " if version_col else "") + "__side ASC"
    return f"""
WITH both_sides AS (
  SELECT *, 1 AS __side FROM ({snapshot_sql})
  UNION ALL BY NAME
  SELECT *, 0 AS __side FROM ({updates_sql})
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {ks} ORDER BY {order}) AS __rn
  FROM both_sides
)
SELECT * EXCLUDE (__side, __rn) FROM ranked WHERE __rn = 1
"""
