"""Autocorrelation function (ACF) of a regularly-keyed series.

Engine extension (SURVEY §2 — the reference has no time-series
surface): lag-k Pearson autocorrelation of a value series keyed by an
integer time index (epoch-day, epoch-hour, …) — the standard
seasonality / burstiness diagnostic run over ingest-volume and
event-rate series before alerting thresholds are set (a strong lag-7
peak on a daily series means weekly seasonality and a naive global
z-score alert will page every weekend).

Semantics: for each lag L in 1..max_lag, pair (t, t+L) rows that BOTH
exist (calendar alignment by integer key arithmetic — gaps pair with
nothing; no imputation), then Pearson r over the pairs via the
sum-form identity

    r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

computed from int64 sums; the two variance factors are cast to double
BEFORE their product (each fits int64; their product does not), the
division is the only other float, and both engines evaluate the
identical pinned expression, round(4).  Zero variance on either side
(constant series) yields NULL, not a 0/0 artifact.

Overflow envelope (int64 sums): with |y| ≤ V and n points per lag,
Σy² ≤ n·V² and the largest term n·Σy² ≤ n²·V² must stay < 2⁶³ —
n = 10⁴ daily points allows V up to ~3e5.  Coarser series (hourly →
daily rollup first) or milli-quantized pre-scaling cover larger
values, same device as operators/anomaly.py.

Spark-first shape: the series (one row per time key — the caller
aggregates raw events first, so this input is already tiny relative
to the event log) is self-joined once per nothing — ONE equi-join
total: the probe side is ``series × lags`` (lags broadcast, ≤
max_lag rows) with join key ``t + L``, so Catalyst plans a single
shuffle pair regardless of max_lag, followed by one partial-aggregated
groupBy(lag).  No window over a global sort, no per-lag pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def autocorrelation(
    series: DataFrame,
    t_col: str = "t",
    y_col: str = "y",
    max_lag: int = 7,
) -> DataFrame:
    """``lag, n_pairs, acf`` for lags 1..max_lag over ``series(t, y)``
    with integer time key ``t`` and integer value ``y``."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    from scholarmind_spark.util import attach_caches

    spark = series.sparkSession
    lags = spark.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    # floor() before the bigint cast: Spark's cast TRUNCATES doubles while
    # DuckDB's ::BIGINT rounds to nearest, so a non-integer series (mean
    # latency per day) would silently diverge between the twins; floor is
    # identical IEEE on both and a no-op for the documented integer inputs.
    # The cast series is persist()-ed: BOTH self-join sides read it, and
    # uncached each side re-runs the caller's upstream aggregation (the
    # DuckDB twin pins __series MATERIALIZED for the same reason).
    a = series.select(
        F.floor(F.col(t_col)).cast("bigint").alias("t"),
        F.floor(F.col(y_col)).cast("bigint").alias("x"),
    ).persist()
    b = a.select(F.col("t").alias("t2"), F.col("x").alias("yv"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("t2") == F.col("t") + F.col("lag"))
    )
    g = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yv").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
        F.sum(F.col("x") * F.col("yv")).alias("sxy"),
    )
    varx = g["n"] * g["sxx"] - g["sx"] * g["sx"]
    vary = g["n"] * g["syy"] - g["sy"] * g["sy"]
    num = (g["n"] * g["sxy"] - g["sx"] * g["sy"]).cast("double")
    denom = F.sqrt(varx.cast("double") * vary.cast("double"))
    out = g.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.when(
            (varx > 0) & (vary > 0), F.round(num / denom, 4)
        ).alias("acf"),
    ).orderBy("lag")
    return attach_caches(out, [a])


def autocorrelation_sql(
    series_sql: str, max_lag: int = 7
) -> str:
    """DuckDB twin of :func:`autocorrelation` — ``series_sql`` must
    select ``t`` (integer key) and ``y``.  Sums are ::BIGINT-pinned
    (DuckDB widens integer sums to HUGEINT; the cast keeps both engines
    in int64 so an overflow would fail loudly on either side rather
    than diverge silently)."""
    return f"""
WITH __series AS MATERIALIZED (SELECT floor(t)::BIGINT AS t,
                                      floor(y)::BIGINT AS y
                               FROM ({series_sql})),
__pairs AS (
  SELECT l.lag, a.y AS x, b.y AS yv
  FROM __series a
  JOIN (SELECT unnest(range(1, {max_lag + 1}))::INT AS lag) l ON true
  JOIN __series b ON b.t = a.t + l.lag
),
__g AS (
  SELECT lag, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(yv)::BIGINT AS sy,
         sum(x * x)::BIGINT AS sxx, sum(yv * yv)::BIGINT AS syy,
         sum(x * yv)::BIGINT AS sxy
  FROM __pairs GROUP BY lag
)
SELECT lag, n AS n_pairs,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round((n * sxy - sx * sy)::DOUBLE
                       / sqrt((n * sxx - sx * sx)::DOUBLE
                              * (n * syy - sy * sy)::DOUBLE), 4)
       END AS acf
FROM __g ORDER BY lag
"""
