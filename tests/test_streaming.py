"""Streaming pipeline: availableNow drain equals the batch computation
(Spark's unified batch/stream semantics make the batch frame the oracle)."""

import pytest
from pyspark.sql import functions as F

from scholarmind_spark.streaming import (
    read_events_stream,
    run_to_memory,
    session_agg,
    stream_dedup,
    tumbling_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    from scholarmind_spark.queries import _events

    df = _events(spark, SF_DIR)
    df.cache().count()
    return df


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark, batch_events):
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    got = run_to_memory(tumbling_agg(stream), mode="complete")
    want = tumbling_agg(batch_events)  # same fn on a batch frame
    cols = ["bucket_start", "event_type", "n_events", "total_value"]
    assert _canon(got, cols) == _canon(want, cols)


def test_session_stream_runs(spark, batch_events):
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    got = run_to_memory(session_agg(stream, gap="30 minutes"), mode="complete")
    assert got.count() > 0
    # every (user, session) has >= 1 event and start <= end
    bad = got.filter(
        (F.col("n_events") < 1) | (F.col("session_start") > F.col("session_end"))
    ).count()
    assert bad == 0
    # session count per user matches the batch lag+running-sum sessionizer
    from scholarmind_spark.queries import events_sessionize

    want = {r["user_id"]: r["n_sessions"] for r in events_sessionize(spark, SF_DIR).collect()}
    have = {
        r["user_id"]: r["cnt"]
        for r in got.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert have == want


def test_stream_dedup_bounds_state(spark, batch_events):
    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    got = run_to_memory(stream_dedup(stream, keys=["user_id", "event_type"]), mode="append")
    # at most one surviving row per (user_id, event_type) within watermark;
    # with a single file the whole input is one microbatch, so exactly one
    n_pairs = batch_events.select("user_id", "event_type").distinct().count()
    assert got.count() == n_pairs


def test_stateful_user_stats_equals_batch(spark, batch_events):
    """applyInPandasWithState running totals: final emitted state per user
    equals the batch groupBy aggregate."""
    from pyspark.sql import functions as F

    from scholarmind_spark.streaming import read_events_stream, run_to_memory
    from scholarmind_spark.streaming.stateful import stateful_user_stats

    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    got = run_to_memory(stateful_user_stats(stream), mode="update")
    # update mode may emit once per microbatch; keep the last row per user
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 4))
        for r in got.orderBy("user_id", "n_events").collect()
    }  # dict keeps the max-n_events row per user (ordered ascending)
    want = {
        r["user_id"]: (r["n"], round(r["tv"], 4))
        for r in batch_events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert final == want


def test_sliding_stream_equals_batch(spark, batch_events):
    from scholarmind_spark.streaming import read_events_stream, sliding_agg

    stream = read_events_stream(spark, SF_DIR)
    got = run_to_memory(sliding_agg(stream), mode="complete", shuffle_partitions=4)
    want = sliding_agg(batch_events)
    cols = ["bucket_start", "event_type", "n_events"]
    assert _canon(got, cols) == _canon(want, cols)


def test_stream_interval_join_equals_batch(spark, batch_events):
    from scholarmind_spark.streaming import stream_interval_join

    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    got = run_to_memory(stream_interval_join(stream), mode="append")
    want = stream_interval_join(batch_events)  # same fn on a batch frame
    cols = ["user_id", "left_id", "right_id", "lag_us"]
    assert _canon(got, cols) == _canon(want, cols)
    # every lag respects the interval bound
    assert got.filter((F.col("lag_us") < 0) | (F.col("lag_us") > 14_400_000_000)).count() == 0


def test_stateful_anomaly_equals_batch(spark, batch_events):
    """Streaming trailing-window z-score (applyInPandasWithState) emits
    exactly the batch operator's rows — same integer predicate, same
    window contents."""
    from scholarmind_spark.operators.anomaly import rolling_anomalies
    from scholarmind_spark.streaming import read_events_stream, run_to_memory
    from scholarmind_spark.streaming.stateful import stateful_anomaly

    stream = read_events_stream(spark, f"{SF_DIR}/events.parquet")
    got = _canon(
        run_to_memory(stateful_anomaly(stream), mode="update"),
        ["key", "event_id", "x_milli", "n", "mean_milli", "anomaly"],
    )
    want = _canon(
        rolling_anomalies(batch_events),
        ["key", "event_id", "x_milli", "n", "mean_milli", "anomaly"],
    )
    assert got == want and len(got) > 0
