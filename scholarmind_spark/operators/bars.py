"""Time-bar downsampling: OHLC + volume bars from an event stream.

Engine extension (the telemetry/metrics compaction shape): a 100 TB
event stream is consumed downstream as fixed-width bars — open / high
/ low / close / count / sum per (bucket) — the classic OHLC compaction
(finance ticks, latency telemetry, sensor downsampling).  The operator
is ONE map-side-combinable aggregation: bucket by integer epoch
division and take every statistic — including open/close via
``min_by``/``max_by`` over a FIXED-WIDTH sortable ``(ts, id)`` string
key — in a single groupBy.  The id tiebreak makes open/close
DETERMINISTIC when timestamps collide (an undefined first-by-ts is the
classic nondeterminism bug in bar builders).  A window formulation
(rank within bucket) would ship every raw event through a per-bucket
SORT on one reducer — a hot hour lands its whole event set on a single
task, the exact hot-key skew partial aggregation exists to avoid; the
groupBy form combines map-side to one row per (bucket, mapper).  The
key is a string because ``min_by``'s ordering argument must be a
SCALAR on both engines (DuckDB has no struct/list min_by): 20 digits
of TZ-FREE epoch microseconds + '#' + 19 zero-padded id digits —
fixed width, so lexicographic order == (ts, id) order.  Epoch micros
(not a rendered wall-clock string) because a local rendering is
non-monotonic across a DST fall-back fold in sessions that don't pin
UTC — two instants alias and open/close can invert for bucket widths
over an hour.  The key requires ``ts >= epoch`` and ``0 <= id <
10^19`` (a sign character — or an id wider than the padded field,
which ``lpad`` would silently TRUNCATE — breaks fixed-width
lexicographic order); both preconditions are enforced at RUNTIME by
an ``assert_true`` guard inside :func:`bar_sort_key` (a cheap
comparison per row, fully codegen-able), so a pre-1970 timestamp or
an out-of-range id fails loudly instead of silently mis-ordering
open/close.

Values are milli-quantized ints in the output (the battery's standard
device) so the DuckDB twin hashes identically; non-finite values are
dropped on both engines."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bar_sort_key(ts_col: str, id_col: str):
    """Fixed-width sortable (ts, id) string key shared by the batch and
    streaming bar builders.  TZ-free: built from epoch MICROSECONDS,
    never a session-timezone rendering (see module docstring).
    Requires ``ts >= epoch`` and ``0 <= id < 10^19`` — enforced per
    row with ``assert_true`` (NULLs pass through; rows with NULL ts or
    id yield a NULL key and are the caller's filter concern).  A
    negative epoch renders with a '-' and an oversized id is silently
    TRUNCATED by lpad — both would corrupt the lexicographic order, so
    out-of-range inputs raise instead of mis-ordering open/close."""
    # the cast is a no-op for TIMESTAMP; for TIMESTAMP_NTZ inputs it
    # resolves the naive value in the session zone (UTC-pinned by the
    # framework — i.e. naive-as-UTC, exactly DuckDB's epoch_us reading
    # of its naive TIMESTAMP), since unix_micros accepts only TIMESTAMP
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    id_str = F.col(id_col).cast("string")
    micros_ok = micros.isNull() | (micros >= 0)
    id_ok = id_str.isNull() | (
        ~id_str.startswith("-") & (F.length(id_str) <= 19)
    )
    guarded_micros = F.when(
        F.assert_true(
            micros_ok,
            F.lit(
                "bar_sort_key: ts before 1970-01-01 is not representable "
                "in the fixed-width sort key (negative epoch micros "
                "break lexicographic order)"
            ),
        ).isNull(),
        micros,
    )
    guarded_id = F.when(
        F.assert_true(
            id_ok,
            F.lit(
                "bar_sort_key: id must be in [0, 10^19) — a sign "
                "character or lpad truncation breaks the fixed-width "
                "sort key"
            ),
        ).isNull(),
        id_str,
    )
    return F.concat(
        F.lpad(guarded_micros.cast("string"), 20, "0"),
        F.lit("#"),
        F.lpad(guarded_id, 19, "0"),
    )


def bar_value_milli(value_col: str):
    """Milli-quantized value with non-finite dropped (NULL)."""
    vc = F.col(value_col)
    finite = vc.isNotNull() & ~F.isnan(vc) & (F.abs(vc) != float("inf"))
    return F.when(finite, F.round(vc * 1000, 0).cast("bigint"))


def bar_aggs():
    """The six OHLC aggregate expressions over columns (sk, vm)."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("vm", "sk").alias("open_milli"),
        F.max("vm").alias("high_milli"),
        F.min("vm").alias("low_milli"),
        F.max_by("vm", "sk").alias("close_milli"),
        F.sum("vm").alias("sum_milli"),
    ]


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
    skey = bar_sort_key(ts_col, id_col)
    base = df.select(
        F.expr(f"unix_timestamp({ts_col}) div {width_seconds}").alias("b"),
        skey.alias("sk"),
        bar_value_milli(value_col).alias("vm"),
    ).where(F.col("vm").isNotNull() & F.col("b").isNotNull())
    agg = base.groupBy("b").agg(*bar_aggs())
    # bucket_start as BIGINT epoch seconds (the events_sliding oracle
    # convention): a to_timestamp() would be TZ-naive in Spark but
    # TIMESTAMPTZ in DuckDB — a type-tag mismatch under the gate's
    # injective canonicalizer
    return agg.select(
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
          lpad(epoch_us({ts_col})::VARCHAR, 20, '0') || '#'
            || lpad({id_col}::VARCHAR, 19, '0') AS sk,
          round({value_col} * 1000, 0)::BIGINT AS vm
   FROM {table}
   WHERE {value_col} IS NOT NULL AND isfinite({value_col})
     AND {ts_col} IS NOT NULL
 )
 SELECT (b * {width_seconds})::BIGINT AS bucket_start,
        count(*)::BIGINT AS n_events,
        min_by(vm, sk)::BIGINT AS open_milli,
        max(vm)::BIGINT AS high_milli,
        min(vm)::BIGINT AS low_milli,
        max_by(vm, sk)::BIGINT AS close_milli,
        sum(vm)::BIGINT AS sum_milli
 FROM base GROUP BY b)"""
