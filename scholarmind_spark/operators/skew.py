"""Skew-handling primitives for 100 TB joins/aggregations.

AQE's skew-join splitting (on in the session factory) handles most cases at
runtime; these are the explicit tools for the cases AQE can't see —
pre-aggregation key explosions and joins where one key dominates a
partition beyond the splittable threshold.

- :func:`salted_join` — replicate the small side N ways, scatter the big
  side with a random salt, join on (key, salt).  Row-identical to the
  plain inner join (salt only changes physical placement, never matching).
- :func:`two_phase_distinct_count` — exact COUNT(DISTINCT v) per key
  without concentrating one giant key's value set in a single task:
  phase 1 dedups (key, value) pairs (shuffle spreads by value too),
  phase 2 counts per key (tiny rows).

The priority-dedup operator handles its own skew case (null/empty DOI keys
become unique synthetic keys — ``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Inner join robust to hot keys on the big side.

    The big side gets ``salt = floor(rand * buckets)`` (seeded; the value
    never affects which rows match, only which task processes them); the
    small side is exploded ``buckets``× so every (key, salt) bucket finds
    its match.  Use when ONE key carries a partition-breaking share of the
    big side and the small side is too large to broadcast outright."""
    salted_big = big.withColumn("__salt", (F.rand(seed) * buckets).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_big.join(salted_small, [on, "__salt"]).drop("__salt")


def two_phase_distinct_count(
    df: DataFrame, key: str | Column, value: str | Column, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) as dedup-then-count.

    Phase 1 shuffles on (key, value) — a hot key's values spread over many
    tasks instead of one; phase 2 aggregates one row per (key, value).
    Same result as ``groupBy(key).agg(countDistinct(value))``; use the
    built-in until a single key's distinct set stops fitting in a task."""
    key_c = F.col(key) if isinstance(key, str) else key
    val_c = F.col(value) if isinstance(value, str) else value
    # NULL values are not distinct values: countDistinct ignores them, so
    # the two-phase twin must too (it silently inflated counts by one on
    # any nullable value column)
    pairs = (
        df.select(key_c.alias("__k"), val_c.alias("__v"))
        .filter(F.col("__v").isNotNull())
        .distinct()
    )
    return pairs.groupBy(F.col("__k").alias(key if isinstance(key, str) else "key")).agg(
        F.count("*").alias(out_col)
    )


def skew_report(df: DataFrame, key: str, top_k: int = 5) -> DataFrame:
    """One-row skew diagnosis for a prospective join/agg key: distinct
    key count, total rows, the maximum and top-k frequencies, and the
    max/mean ratio in integer per-mille — the numbers that decide
    between a plain shuffle join, AQE skew splitting, and
    :func:`salted_join`.

    Two aggregates: key frequencies (one partial-agg shuffle of the
    input), then a scalar roll-up of the tiny frequency relation —
    cost is the same as the groupBy the key would pay anyway.  The
    top-k hot keys are gathered with ``sort_array(collect_list)``
    over the top-k-filtered rows, never a global sort."""
    freq = df.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count("*").alias("n")
    )
    # orderBy().limit() plans TakeOrderedAndProject (per-partition heaps
    # + driver merge) — the frequency relation can itself be huge, so no
    # global window / single-task sort here
    hot = freq.orderBy(F.desc("n"), F.asc("k")).limit(top_k)
    stats = freq.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_freq"),
    ).select(
        "n_keys",
        "n_rows",
        "max_freq",
        # max/mean in per-mille, all-integer: mean = n_rows/n_keys
        # decimal(38,0) intermediate: the int64 product max_freq·n_keys·1000
        # overflows (ANSI: ARITHMETIC_OVERFLOW) at ~1e10 keys × 1e6 hot rows
        # — exactly the diagnostic's target scale; floor(decimal/) equals
        # integer div for the non-negative operands here
        F.floor(
            F.expr(
                "(cast(max_freq as decimal(38,0)) * n_keys * 1000) / n_rows"
            )
        ).cast("bigint").alias("skew_permille"),
    )
    hot_list = hot.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("n"), F.col("k"))), asc=False
        ).alias("hot")
    ).select(
        F.transform("hot", lambda s: s["k"]).alias("hot_keys"),
        F.transform("hot", lambda s: s["n"]).alias("hot_freqs"),
    )
    return stats.crossJoin(F.broadcast(hot_list))


def skew_report_sql(table: str, key_expr: str, top_k: int = 5) -> str:
    """DuckDB twin of :func:`skew_report`."""
    return f"""
WITH __freq AS (
  SELECT ({key_expr})::VARCHAR AS k, count(*)::BIGINT AS n
  FROM {table} GROUP BY 1
),
__stats AS (
  SELECT count(*)::BIGINT AS n_keys, sum(n)::BIGINT AS n_rows,
         max(n)::BIGINT AS max_freq
  FROM __freq
),
__hot AS (
  SELECT k, n FROM __freq ORDER BY n DESC, k LIMIT {top_k}
),
__hot_list AS (
  SELECT list_transform(l, s -> s['k']) AS hot_keys,
         list_transform(l, s -> s['n']) AS hot_freqs
  FROM (
    SELECT list_sort(list({{'n': n, 'k': k}}), 'DESC') AS l FROM __hot
  )
)
SELECT n_keys, n_rows, max_freq,
       ((max_freq::HUGEINT * n_keys * 1000) // n_rows)::BIGINT AS skew_permille,
       hot_keys, hot_freqs
FROM __stats, __hot_list"""
