"""Time-bar downsampling: OHLC + volume bars from an event stream.

Engine extension (the telemetry/metrics compaction shape): a 100 TB
event stream is consumed downstream as fixed-width bars — open / high
/ low / close / count / sum per (bucket) — the classic OHLC compaction
(finance ticks, latency telemetry, sensor downsampling).  The operator
is ONE window pass: bucket by integer epoch division, rank events
within the bucket by ``(ts, id)`` (the id tiebreak makes open/close
DETERMINISTIC when timestamps collide — an undefined first-by-ts is
the classic nondeterminism bug in bar builders), and take every
aggregate over the same window frame, so the plan is a single shuffle
on the bucket key; no second groupBy.

Values are milli-quantized ints in the output (the battery's standard
device) so the DuckDB twin hashes identically; non-finite values are
dropped on both engines."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bars(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    width_seconds: int = 3600,
) -> DataFrame:
    """``bucket_start, n_events, open_milli, high_milli, low_milli,
    close_milli, sum_milli`` per ``width_seconds`` bucket
    (``bucket_start`` = BIGINT epoch seconds)."""
    if width_seconds < 1:
        raise ValueError("width_seconds must be >= 1")
    vc = F.col(value_col)
    finite = vc.isNotNull() & ~F.isnan(vc) & (F.abs(vc) != float("inf"))
    base = df.select(
        F.expr(f"unix_timestamp({ts_col}) div {width_seconds}").alias("b"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.when(finite, F.round(vc * 1000, 0).cast("bigint")).alias("vm"),
    ).where(F.col("vm").isNotNull() & F.col("b").isNotNull())
    w = Window.partitionBy("b").orderBy("t", "i")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = base.select(
        "b",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(frame).alias("n_events"),
        F.first("vm").over(frame).alias("open_milli"),
        F.max("vm").over(frame).alias("high_milli"),
        F.min("vm").over(frame).alias("low_milli"),
        F.last("vm").over(frame).alias("close_milli"),
        F.sum("vm").over(frame).alias("sum_milli"),
    )
    # bucket_start as BIGINT epoch seconds (the events_sliding oracle
    # convention): a to_timestamp() would be TZ-naive in Spark but
    # TIMESTAMPTZ in DuckDB — a type-tag mismatch under the gate's
    # injective canonicalizer
    return ranked.where(F.col("rn") == 1).select(
        (F.col("b") * width_seconds).cast("bigint").alias("bucket_start"),
        F.col("n_events").cast("bigint"),
        "open_milli",
        "high_milli",
        "low_milli",
        "close_milli",
        "sum_milli",
    )


def time_bars_sql(
    table: str,
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    width_seconds: int = 3600,
) -> str:
    """DuckDB twin of :func:`time_bars` — same bucketing, same
    (ts, id) tiebreak, same milli quantization."""
    if width_seconds < 1:
        raise ValueError("width_seconds must be >= 1")
    return f"""
(WITH base AS (
   SELECT floor(epoch({ts_col}))::BIGINT // {width_seconds} AS b,
          {ts_col} AS t, {id_col} AS i,
          round({value_col} * 1000, 0)::BIGINT AS vm
   FROM {table}
   WHERE {value_col} IS NOT NULL AND isfinite({value_col})
     AND {ts_col} IS NOT NULL
 ),
 ranked AS (
   SELECT b,
          row_number() OVER (PARTITION BY b ORDER BY t, i) AS rn,
          count(*) OVER (PARTITION BY b)::BIGINT AS n_events,
          first_value(vm) OVER (PARTITION BY b ORDER BY t, i
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS open_milli,
          max(vm) OVER (PARTITION BY b)::BIGINT AS high_milli,
          min(vm) OVER (PARTITION BY b)::BIGINT AS low_milli,
          last_value(vm) OVER (PARTITION BY b ORDER BY t, i
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS close_milli,
          sum(vm) OVER (PARTITION BY b)::BIGINT AS sum_milli
   FROM base
 )
 SELECT (b * {width_seconds})::BIGINT AS bucket_start,
        n_events, open_milli, high_milli, low_milli, close_milli, sum_milli
 FROM ranked WHERE rn = 1)"""
