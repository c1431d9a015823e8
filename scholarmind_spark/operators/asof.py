"""As-of (point-in-time) join — an operator Spark's built-ins lack,
composed from union + ordered window instead of Python.

For each left row, attach the most recent right row with the same key and
``right.ts <= left.ts`` (the time-series "latest value as of" join; DuckDB
expresses it natively as ``ASOF JOIN``, which the correctness oracle uses).

Scale design: the naive formulation is an inequality join (O(n·m) pairs
per key under a cross + filter, or a skew-prone range join).  This
implementation is the sort-merge shape: tag both sides, UNION, and run ONE
window over (key) ordered by (ts, side, tiebreak) carrying
``last(struct(right_row), ignoreNulls)`` forward — a single shuffle on the
key, linear work per partition, no pair blow-up.  Right rows sort BEFORE
left rows at equal ts so ties match (ASOF ``>=`` semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` values at
    or before its timestamp (nulls when no prior right row exists).

    ``right`` should be unique per (key, ts) — pre-aggregate if not, or
    the carried value at a tied timestamp is undefined.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (key, ts)]

    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.select(
        key,
        ts,
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).withColumn("__side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # right rows (side=0) order before left rows at equal ts → ties match
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE struct carries the whole matched right row (its ts + all value
    # columns) so the matched row's values — including its NULLs — travel
    # together.  Per-column last(ignorenulls) would skip a NULL in the
    # matched row and surface an OLDER row's non-NULL value, silently
    # mixing columns from different right rows (and diverging from SQL
    # ASOF JOIN semantics, which return the matched row as-is).
    carried = unioned.withColumn(
        "__match",
        F.last(
            F.when(
                F.col("__side") == 0,
                F.struct(
                    F.col(ts).alias("__ts"),
                    *[F.col(f"__r_{c}").alias(c) for c in value_cols],
                ),
            ),
            ignorenulls=True,
        ).over(w),
    )
    out = carried.filter(F.col("__side") == 1).select(
        *left.columns,
        F.col("__match.__ts").alias(right_ts_alias),
        *[F.col(f"__match.{c}").alias(c) for c in value_cols],
    )
    return out
