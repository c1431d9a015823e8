"""Table profiling: per-column null count, distinct count, min/max.

Data-quality triage before a curation run: one pass over the table
computes every column's aggregates in a single job (one wide agg row,
unpivoted with ``stack``), so profiling a 100 TB table costs one scan —
not one scan per column.  Values are compared as VARCHAR on both engines
so the oracle is format-independent for integer/string columns (profile
callers pass ``columns`` to skip floating-point columns whose text
rendering is engine-specific).

Distinct counts are EXACT here so DuckDB can verify them bit-for-bit;
the 100 TB swap is ``approx_count_distinct`` (error bound pinned by
``tests/test_approx.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: ``col_name, n_null, n_distinct, min_val,
    max_val`` — one row per profiled column, one scan total."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__n_{c}"),
            F.countDistinct(F.col(c)).alias(f"__d_{c}"),
            F.min(s).alias(f"__mn_{c}"),
            F.max(s).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __d_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_null, n_distinct, min_val, max_val)"
    ).orderBy("col_name")


def profile_table_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin: one SELECT per column, unioned."""
    parts = [
        f"SELECT '{c}' AS col_name,"
        f" sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,"
        f" count(DISTINCT {c}) AS n_distinct,"
        f" min({c}::VARCHAR) AS min_val, max({c}::VARCHAR) AS max_val"
        f" FROM {table}"
        for c in columns
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"
