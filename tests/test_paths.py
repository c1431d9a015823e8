from __future__ import annotations

import datetime

import duckdb

from scholarmind_spark.operators.paths import session_paths, session_paths_sql


def _events(spark, spec):
    """spec: list of (user, minute_offset, event_type)."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=m), u, et)
        for i, (u, m, et) in enumerate(spec)
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])


def test_paths_follow_time_order_and_gap_split(spark):
    spec = [
        (1, 0, "view"), (1, 5, "click"), (1, 10, "buy"),     # session A
        (1, 120, "view"), (1, 125, "click"),                  # session B (gap)
        (2, 0, "view"), (2, 3, "click"),                      # session C
    ]
    got = {r["path"]: r["n_sessions"] for r in session_paths(_events(spark, spec)).collect()}
    assert got == {"view>click": 2, "view>click>buy": 1}


def test_path_cap_bounds_runaway_sessions(spark):
    spec = [(1, m, "e") for m in range(30)]  # one 30-event session
    got = session_paths(_events(spark, spec), max_events=4).collect()
    assert [(r["path"], r["n_sessions"]) for r in got] == [("e>e>e>e", 1)]


def test_topk_tiebreak_is_path_asc(spark):
    spec = [(u, 0, t) for u, t in ((1, "a"), (2, "b"), (3, "c"))]
    got = [r["path"] for r in session_paths(_events(spark, spec), k=2).collect()]
    assert got == ["a", "b"]


def test_matches_duckdb_twin(spark, tmp_path):
    spec = [
        (u, m + (u * 3) % 7, ["view", "click", "buy"][(u + m) % 3])
        for u in range(6)
        for m in range(0, 300, 40)
    ]
    df = _events(spark, spec)
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.parquet(p)
    got = [(r["path"], r["n_sessions"]) for r in session_paths(df).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM '{p}/*.parquet'")
    want = con.sql(session_paths_sql("ev")).fetchall()
    assert got == want and len(got) > 2


def test_subsecond_gap_boundary_matches_duckdb(spark, tmp_path):
    """Gaps that straddle the boundary only in fractional seconds: Spark's
    unix_timestamp truncates to whole seconds, so the oracle must floor()
    epoch() too — frac diff 1800.8 s with whole-second diff 1800 s is the
    SAME session in both engines."""
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0, 100_000)  # .1s
    rows = [
        (0, t0, 1, "view"),
        # +1800.8s fractional, +1800s whole-second -> same session
        (1, t0 + datetime.timedelta(seconds=1800, microseconds=800_000), 1, "click"),
        # +1801.1s fractional, +1801s whole-second -> new session
        (2, t0 + datetime.timedelta(seconds=3601, microseconds=900_000), 1, "buy"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.parquet(p)
    got = sorted((r["path"], r["n_sessions"]) for r in session_paths(df).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM '{p}/*.parquet'")
    want = sorted(con.sql(session_paths_sql("ev")).fetchall())
    assert got == want == [("buy", 1), ("view>click", 1)]
