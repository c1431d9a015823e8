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
    tiebreak: str | None = None,
) -> DataFrame:
    """One surviving row per key: the updates row unless the snapshot's
    ``version_col`` is strictly higher (out-of-order increments).

    PRECONDITION (the standard SQL MERGE contract, where multiple update
    matches per key are an error): ``updates`` carries at most one row
    per ``(keys, version_col)``.  If a feed can violate that, pass
    ``tiebreak`` (a column whose ascending order picks the winner) —
    otherwise equal-version duplicates tie in the window and the survivor
    follows physical row order, which changes under repartitioning or
    task retry."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    s = snapshot.withColumn("__side", F.lit(1))
    u = updates.withColumn("__side", F.lit(0))
    both = s.unionByName(u)
    order = []
    if version_col:
        order.append(F.desc(version_col))
    order += [F.asc("__side")]  # updates (0) beat snapshot (1) on version tie
    if tiebreak:
        order.append(F.asc(tiebreak))
    w = Window.partitionBy(*ks).orderBy(*order)
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__side")
    )


def scd2_history(
    updates: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a keyed change feed:
    ``key, *attr_cols, valid_from, valid_to, is_current`` where
    ``[valid_from, valid_to)`` is each attribute version's validity
    interval and the open (current) version has NULL ``valid_to``.

    Consecutive updates whose tracked attributes did not change are
    suppressed (null-safe struct compare), so the history holds one row
    per ACTUAL change — the standard warehouse SCD2 contract.

    Two window passes over the same ``(key → ts, tiebreak)`` ordering
    (change suppression, then interval close via ``lead``); one shuffle
    on the key — Catalyst reuses the exchange for both windows.  At
    100 TB the feed partitions by key; no global sort, no join."""
    order = [F.asc(ts_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    cur = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        updates.withColumn("__prev", F.lag(cur).over(w))
        .filter(F.col("__prev").isNull() | ~cur.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    return changed.select(
        key,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def scd2_history_sql(
    updates_sql: str,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> str:
    """DuckDB twin of :func:`scd2_history` (same ordering, same null-safe
    change suppression, same interval close).

    Two dialect traps pinned here: Spark's ``ASC`` is NULLS FIRST while
    DuckDB's default is NULLS LAST (a null-ts row would sort to opposite
    ends and shift every interval), and the first-row test must be
    ``row_number() = 1`` — ``lag(ts) IS NULL`` misfires on the row AFTER
    a null-ts row."""
    order = (f"{ts_col} ASC NULLS FIRST"
             + (f", {tiebreak} ASC NULLS FIRST" if tiebreak else ""))
    attrs = ", ".join(attr_cols)
    # carry the tiebreak through `changed` — w2 orders by it
    extra = f", {tiebreak}" if tiebreak and tiebreak not in attr_cols else ""
    prev = ", ".join(f"lag({c}) OVER w AS __p_{c}" for c in attr_cols)
    diff = " OR ".join(f"{c} IS DISTINCT FROM __p_{c}" for c in attr_cols)
    return f"""
WITH feed AS ({updates_sql}),
marked AS (
  SELECT {key}, {attrs}, {ts_col}{extra},
         (row_number() OVER w = 1) AS __first, {prev}
  FROM feed
  WINDOW w AS (PARTITION BY {key} ORDER BY {order})
),
changed AS (
  SELECT {key}, {attrs}, {ts_col}{extra} FROM marked
  WHERE __first OR {diff}
)
SELECT {key}, {attrs}, {ts_col} AS valid_from,
       lead({ts_col}) OVER w2 AS valid_to,
       (lead({ts_col}) OVER w2 IS NULL) AS is_current
FROM changed
WINDOW w2 AS (PARTITION BY {key} ORDER BY {order})
"""


def merge_upsert_sql(
    snapshot_sql: str,
    updates_sql: str,
    keys: list[str],
    version_col: str | None = None,
    tiebreak: str | None = None,
) -> str:
    """DuckDB twin: same union + one-winner-per-key window."""
    ks = ", ".join(keys)
    order = (f"{version_col} DESC, " if version_col else "") + "__side ASC"
    if tiebreak:
        order += f", {tiebreak} ASC"
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
