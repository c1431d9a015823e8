"""Referential-integrity audit: orphan counts across FK relationships.

Engine extension (SURVEY §2): the data-quality gate a warehouse runs
after every load — for each declared child→parent relationship, count
child rows whose foreign key has no matching parent (NULL keys are
counted separately, not as orphans, per SQL FK semantics).

Spark-first shape: each relationship is one LEFT ANTI join — Spark
broadcasts the parent's distinct key set when small and falls back to
a shuffled hash join otherwise (AQE decides from measured sizes, the
right behavior when `parent` is a 100-row region table one day and a
billion-row orders table the next).  The per-edge results are a
handful of scalar rows unioned together — no driver-side loop touches
row data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_integrity_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """``relationship, n_child, n_null_fk, n_orphans`` per declared edge
    ``(name, child_df, fk_col, parent_df, pk_col)``."""
    outs = []
    for name, child, fk, parent, pk in edges:
        keys = child.select(F.col(fk).alias("__fk"))
        nn = keys.filter(F.col("__fk").isNotNull())
        orphans = nn.join(
            parent.select(F.col(pk).alias("__fk")).distinct(),
            "__fk",
            "left_anti",
        )
        outs.append(
            keys.agg(
                F.lit(name).alias("relationship"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.col("__fk").isNull().cast("long")).alias("n_null_fk"),
            ).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def fk_integrity_audit_sql(
    edges: list[tuple[str, str, str, str, str]],
) -> str:
    """DuckDB twin over table names:
    ``(name, child_table, fk_col, parent_table, pk_col)``."""
    parts = [
        f"""
SELECT '{name}' AS relationship,
       count(*)::BIGINT AS n_child,
       sum(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_fk,
       (SELECT count(*)::BIGINT FROM {child} c
        WHERE c.{fk} IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})
       ) AS n_orphans
FROM {child}"""
        for name, child, fk, parent, pk in edges
    ]
    return "\nUNION ALL\n".join(parts)
