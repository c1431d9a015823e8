"""Trailing-window z-score anomaly detection over an event stream.

Engine extension (SURVEY §2 — the reference has no time-series
surface): flag events whose value deviates more than ``z`` standard
deviations from that user's trailing window — the workhorse shape for
metric-spike detection, abusive-client flagging, and sensor QA over
an events table.

Exact cross-engine semantics with NO floats: values are quantized to
integer MILLI units once, and the z-test is algebraically cleared of
divisions and square roots —

    |x - mean| > z * stddev_pop
    ⟺  n·(n·x − s)² > z²·(n·q − s²)      (s = Σxᵢ, q = Σxᵢ²)

so the flag is a pure int64 predicate.  Overflow envelope: with
x ≤ Vm milli units, the largest term is n·(n·x − s)² ≤ 4·n³·Vm², so
int64 safety requires Vm ≤ sqrt(2⁶³ / 4n³) — for the default window
n = 10 that is |value| ≤ ~4.8e4 (NOT 1e6: at |value| ~1e6, q = Σx²
alone is ~1e19 > 2⁶³ and Spark silently wraps while DuckDB raises).
The bound scales as n^(-3/2); callers with wider windows or larger
values must quantize coarser than milli.  ``stddev`` here is the
population form over the trailing window, which the identity encodes
implicitly — no engine's sample/population default is consulted.

Spark-first shape: one shuffle on the partition key (user), then a
single window pass computing n, s and q over ``rows between W
preceding and 1 preceding`` (the current row is excluded so a spike
cannot mask itself).  The frame is row-bounded state — O(W) per
partition — and at 100 TB the only concern is per-user skew, which a
composite partition key (user, day) bounds the usual way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MILLI = 1_000


def rolling_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    window: int = 10,
    min_n: int = 5,
    z: int = 3,
) -> DataFrame:
    """``key, event_id, x_milli, n, mean_milli, anomaly`` for every event
    with at least ``min_n`` trailing observations; ``anomaly`` is the
    exact integer z-test above."""
    x = F.round(F.col(value_col) * MILLI).cast("long")
    w = (
        Window.partitionBy("key")
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    base = df.select(
        F.col(key_col).alias("key"),
        *[F.col(c) for c in order_cols],
        x.alias("x"),
    ).select(
        "key",
        F.col(order_cols[1]),
        "x",
        F.count("x").over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("q"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    test = (
        F.col("n") * dev * dev
        > F.lit(z * z) * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    )
    return (
        base.filter(F.col("n") >= min_n)
        .select(
            "key",
            F.col(order_cols[1]),
            F.col("x").alias("x_milli"),
            F.col("n").cast("bigint").alias("n"),
            F.expr("s div n").alias("mean_milli"),
            test.cast("boolean").alias("anomaly"),
        )
    )


def rolling_anomalies_sql(
    table: str,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    window: int = 10,
    min_n: int = 5,
    z: int = 3,
) -> str:
    """DuckDB twin of :func:`rolling_anomalies` — same quantization,
    frame, and cleared-form integer predicate."""
    o1, o2 = order_cols
    return f"""
WITH __b AS (
  SELECT {key_col} AS key, {o1}, {o2},
         round({value_col} * {MILLI})::BIGINT AS x
  FROM {table}
),
__w AS (
  SELECT key, {o2}, x,
         count(x) OVER f::BIGINT AS n,
         sum(x) OVER f::BIGINT AS s,
         sum(x * x) OVER f::BIGINT AS q
  FROM __b
  WINDOW f AS (PARTITION BY key ORDER BY {o1}, {o2}
               ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)
)
SELECT key, {o2}, x AS x_milli, n, s // n AS mean_milli,
       (n * (n * x - s) * (n * x - s)
        > {z * z} * (n * q - s * s)) AS anomaly
FROM __w WHERE n >= {min_n}"""
