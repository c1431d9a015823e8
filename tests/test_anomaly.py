from __future__ import annotations

import datetime

import duckdb

from scholarmind_spark.operators.anomaly import rolling_anomalies, rolling_anomalies_sql


def _events(spark, vals, user=1):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), user, float(v))
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])


def test_spike_is_flagged_and_baseline_is_not(spark):
    vals = [10.0, 10.1, 9.9, 10.0, 10.2, 10.0, 100.0, 10.1]
    df = _events(spark, vals)
    got = {r["event_id"]: r["anomaly"] for r in rolling_anomalies(df, min_n=5).collect()}
    assert got[6] is True  # the spike
    assert got[5] is False and got[7] is False  # steady neighbours
    # 7's window contains the spike, which inflates sigma — still sane


def test_min_n_gate(spark):
    df = _events(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    rows = rolling_anomalies(df, min_n=5).collect()
    assert {r["event_id"] for r in rows} == {5}  # only the 6th has 5 trailing


def test_constant_series_never_flags(spark):
    # zero variance: test is (n*dev)^2 > 0 with dev=0 -> false, no div-by-zero
    df = _events(spark, [5.0] * 12)
    rows = rolling_anomalies(df, min_n=5).collect()
    assert rows and all(r["anomaly"] is False for r in rows)


def test_users_are_independent(spark):
    a = _events(spark, [1.0] * 8, user=1)
    b = _events(spark, [1000.0] * 8, user=2)
    df = a.unionByName(b)
    rows = rolling_anomalies(df, min_n=5).collect()
    assert rows and all(r["anomaly"] is False for r in rows)


def test_matches_duckdb_twin(spark, tmp_path):
    vals = [3.0, 3.1, 2.9, 3.0, 3.05, 50.0, 3.0, -40.0, 3.1, 3.0, 2.95]
    df = _events(spark, vals)
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.parquet(p)
    got = {
        (r["key"], r["event_id"], r["x_milli"], r["n"], r["mean_milli"], r["anomaly"])
        for r in rolling_anomalies(df, min_n=3).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(rolling_anomalies_sql("ev", min_n=3)).fetchall())
    assert got == want and any(r[-1] for r in got)
