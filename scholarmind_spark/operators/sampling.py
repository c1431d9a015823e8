"""Deterministic sampling & splitting for training-data pipelines.

``df.sample()``/``sampleBy()`` are seeded-random per partition — results
change under repartitioning, which makes lineage audits and incremental
rebuilds impossible at 100 TB.  These operators derive every decision from
a HASH OF THE ROW KEY instead: stable under any partitioning, any cluster
size, any engine (md5-based, so DuckDB reproduces them bit-for-bit), and
join-free (a pure projection/filter that pushes down to the scan).

- :func:`hash_bucket` — uniform bucket in [0, buckets) from the key.
- :func:`deterministic_split` — train/val/test by cumulative weight over
  the hash bucket (the standard reproducible split).
- :func:`stratified_sample` — per-class keep-rates applied via the same
  bucket (downsample overrepresented classes deterministically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.neardup import minhash_base

N_BUCKETS = 1_000_000


def hash_bucket(key: Column, buckets: int = N_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets): 60-bit md5 of the key
    string, modulo buckets."""
    return minhash_base(key.cast("string")) % buckets


def hash_bucket_sql(expr: str, buckets: int = N_BUCKETS) -> str:
    return f"((('0x' || substring(md5(({expr})::VARCHAR), 1, 15))::BIGINT) % {buckets})"


def deterministic_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label by cumulative weight over its hash
    bucket — e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``.  The same
    key ALWAYS lands in the same split, on any engine or cluster."""
    total = sum(weights.values())
    b = hash_bucket(F.col(key))
    expr: Column | None = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        cond = b < int(cum * N_BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def deterministic_split_sql(
    key_expr: str, weights: dict[str, float], buckets: int = N_BUCKETS
) -> str:
    total = sum(weights.values())
    b = hash_bucket_sql(key_expr, buckets)
    items = list(weights.items())
    whens, cum = [], 0.0
    for name, w in items[:-1]:
        cum += w / total
        whens.append(f"WHEN {b} < {int(cum * buckets)} THEN '{name}'")
    return f"CASE {' '.join(whens)} ELSE '{items[-1][0]}' END"


def stratified_sample(
    df: DataFrame,
    key: str,
    class_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row with its class's rate, decided by the row's hash
    bucket — deterministic ``sampleBy``.  Classes absent from ``rates``
    keep ``default_rate``."""
    b = hash_bucket(F.col(key))
    rate: Column = F.lit(default_rate)
    for cls, r in sorted(rates.items()):
        rate = F.when(F.col(class_col) == cls, F.lit(r)).otherwise(rate)
    return df.filter(b < (rate * N_BUCKETS).cast("bigint"))


def stratified_sample_sql(
    key_expr: str,
    class_expr: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    buckets: int = N_BUCKETS,
) -> str:
    b = hash_bucket_sql(key_expr, buckets)
    rate = f"{default_rate}"
    for cls, r in sorted(rates.items()):
        rate = f"CASE WHEN {class_expr} = '{cls}' THEN {r} ELSE {rate} END"
    return f"{b} < (({rate}) * {buckets})::BIGINT"
