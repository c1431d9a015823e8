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


def fd_audit(
    df: DataFrame, lhs: str, rhs: str
) -> DataFrame:
    """Functional-dependency audit: does ``lhs`` determine ``rhs``?

    One row: distinct lhs count, how many lhs values map to more than
    one rhs (violations), the worst fan-out, and the exact violation
    per-mille — the schema-inference check behind "can I use this as a
    join key / dedup key / partition column".  ``lhs -> rhs`` holds
    iff ``n_violating = 0``.

    Two partial-aggregated shuffles: distinct (lhs, rhs) pairs, then a
    per-lhs rollup of the (much smaller) pair relation; the final row
    is a scalar aggregate.  NULL lhs rows are excluded (a null key
    determines nothing); NULL rhs counts as a value (lhs -> NULL-or-x
    is a real violation)."""
    pairs = (
        df.filter(F.col(lhs).isNotNull())
        .select(F.col(lhs).alias("l"), F.col(rhs).alias("r"))
        .distinct()
    )
    per_l = pairs.groupBy("l").agg(F.count("*").alias("fanout"))
    return per_l.agg(
        F.count("*").cast("bigint").alias("n_lhs"),
        F.sum((F.col("fanout") > 1).cast("long")).cast("bigint").alias(
            "n_violating"
        ),
        F.max("fanout").cast("bigint").alias("max_fanout"),
        F.expr(
            "(sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) * 1000"
            " + count(*) div 2) div count(*)"
        ).alias("violation_permille"),
    )


def fd_audit_sql(table: str, lhs: str, rhs: str) -> str:
    """DuckDB twin of :func:`fd_audit`."""
    return f"""
WITH __pairs AS (
  SELECT DISTINCT {lhs} AS l, {rhs} AS r FROM {table}
  WHERE {lhs} IS NOT NULL
),
__per_l AS (SELECT l, count(*)::BIGINT AS fanout FROM __pairs GROUP BY l)
SELECT count(*)::BIGINT AS n_lhs,
       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
       max(fanout)::BIGINT AS max_fanout,
       (sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT * 1000
        + count(*)::BIGINT // 2) // count(*)::BIGINT AS violation_permille
FROM __per_l"""
