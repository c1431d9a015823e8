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
    pairs = df.select(key_c.alias("__k"), val_c.alias("__v")).distinct()
    return pairs.groupBy(F.col("__k").alias(key if isinstance(key, str) else "key")).agg(
        F.count("*").alias(out_col)
    )
