"""Binned range join: pairs within a time tolerance as an EQUI-join.

Spark's optimizer has no range-join strategy — a plain
``a.ts BETWEEN b.ts - tol AND b.ts + tol`` predicate with only the key as
an equi-condition degenerates to per-key cross products, which a hot key
turns into an O(n²) task.  The standard fix bins time into
``tolerance``-wide buckets: a pair within tolerance is at most one bin
apart, so replicating ONE side into its bin and both neighbors turns the
range predicate into an exact equi-join on ``(key, bin)`` followed by a
cheap residual filter.  Cost: 3× replication of one side (pick the
smaller) and a normal hash join — shuffle scales linearly, hot keys split
across bins.

Used by ``events_range_join`` in the gate; the DuckDB oracle runs the
plain inequality join, proving the binned plan is result-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_left: str,
    ts_right: str,
    tolerance_s: int,
    count_col: str = "n_in_range",
) -> DataFrame:
    """Per left row: count of right rows with the same ``key`` and
    ``|ts_left - ts_right| <= tolerance_s``.  Left rows with no match keep
    count 0 (left join semantics)."""
    lsec = F.unix_timestamp(F.col(ts_left))
    rsec = F.unix_timestamp(F.col(ts_right))
    # per-ROW grouping id: grouping back by the left columns would collapse
    # fully-duplicate left rows into one output row, breaking the "one count
    # per left row" contract
    l = left.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__bin", F.floor(lsec / tolerance_s)
    )
    # replicate the RIGHT side into its bin and both neighbors
    r = (
        right.select(
            F.col(key).alias("__rkey"),
            rsec.alias("__rsec"),
            F.floor(rsec / tolerance_s).alias("__rbin"),
        )
        .withColumn(
            "__bin_r",
            F.explode(F.array(F.col("__rbin") - 1, F.col("__rbin"), F.col("__rbin") + 1)),
        )
        .drop("__rbin")
    )
    joined = l.join(
        r,
        (F.col(key) == F.col("__rkey")) & (F.col("__bin") == F.col("__bin_r")),
        "left",
    ).withColumn(
        "__hit",
        F.when(
            F.abs(F.unix_timestamp(F.col(ts_left)) - F.col("__rsec")) <= tolerance_s, 1
        ).otherwise(0),
    )
    group_cols = ["__rid"] + [c for c in left.columns] + ["__bin"]
    out = (
        joined.groupBy(*group_cols)
        .agg(F.sum("__hit").alias(count_col))
        .drop("__rid", "__bin")
        .withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)).cast("long"))
    )
    return out
