"""Snapshot diff: added / removed / changed keys between two snapshots.

Engine extension (SURVEY §2): the audit companion to the incremental
merge (operators/merge.py) and SCD2 history — given yesterday's and
today's snapshot of a keyed table, report exactly which keys appeared,
vanished, or changed content.  At 100 TB this is the cheap pre-check
that decides whether a downstream rebuild is needed at all, and the
reconciliation step after a backfill.

Semantics: one row per key present in either snapshot whose state
differs —

    added    key in new only
    removed  key in old only
    changed  key in both, any compare column differs (null-safe)

unchanged keys are not emitted.  Comparison is null-safe equality per
column (NULL == NULL holds), so no canonicalization/hashing step can
introduce engine skew.

Spark-first shape: one full outer join hash-partitioned on the key —
both snapshots shuffle once, compare columns evaluate JVM-side, and
the unchanged majority is filtered before anything else happens.  For
very wide rows, pre-hashing the compare columns into one digest column
trades scan width for hash cost; the join shape is unchanged.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """``*key_cols, status`` for every key whose state differs between
    ``old`` and ``new`` (status in added/removed/changed).

    Default ``compare_cols`` is the INTERSECTION of both sides' non-key
    columns: after schema evolution (a backfill adds a column to ``new``),
    the diff compares what both snapshots actually carry instead of
    crashing on the column ``old`` lacks; pass explicit ``compare_cols``
    to force an error on schema drift instead."""
    if compare_cols is None:
        common = set(old.columns) & set(new.columns)
        compare_cols = [c for c in new.columns if c not in key_cols and c in common]
    o = old.select(
        *[F.col(c).alias(f"__ko_{c}") for c in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__kn_{c}") for c in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [o[f"__ko_{c}"].eqNullSafe(n[f"__kn_{c}"]) for c in key_cols],
    )
    j = o.join(n, cond, "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
            for c in compare_cols
        ],
        F.lit(True),
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.select(
            *[
                F.coalesce(F.col(f"__ko_{c}"), F.col(f"__kn_{c}")).alias(c)
                for c in key_cols
            ],
            status.alias("status"),
        )
        .filter(F.col("status").isNotNull())
    )


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    key_cols: list[str],
    compare_cols: list[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff` (same null-safe semantics
    via IS NOT DISTINCT FROM)."""
    keys_eq = " AND ".join(
        f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in key_cols
    )
    same = " AND ".join(
        f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in compare_cols
    ) or "TRUE"
    key_out = ", ".join(
        f"coalesce(o.{c}, n.{c}) AS {c}" for c in key_cols
    )
    return f"""
SELECT {key_out},
       CASE WHEN o.__in_old IS NULL THEN 'added'
            WHEN n.__in_new IS NULL THEN 'removed'
            WHEN NOT ({same}) THEN 'changed' END AS status
FROM (SELECT *, 1 AS __in_old FROM ({old_sql})) o
FULL OUTER JOIN (SELECT *, 1 AS __in_new FROM ({new_sql})) n
  ON {keys_eq}
WHERE CASE WHEN o.__in_old IS NULL THEN 'added'
           WHEN n.__in_new IS NULL THEN 'removed'
           WHEN NOT ({same}) THEN 'changed' END IS NOT NULL"""
