"""ACF tests: exact values on constructed periodic series, calendar-gap
pairing, constant-series NULL, and DuckDB twin parity."""

from __future__ import annotations

import duckdb

from scholarmind_spark.operators.acf import autocorrelation, autocorrelation_sql


def _series(spark, pts):
    return spark.createDataFrame(pts, ["t", "y"])


def _acf(spark, pts, max_lag=3):
    out = autocorrelation(_series(spark, pts), max_lag=max_lag).collect()
    return {r["lag"]: (r["n_pairs"], r["acf"]) for r in out}


def test_alternating_series_is_anticorrelated(spark):
    # 0,10,0,10,... lag-1 pairs are always (0,10)/(10,0) → r = -1;
    # lag-2 pairs repeat the same value → r = +1.
    pts = [(t, 10 * (t % 2)) for t in range(20)]
    r = _acf(spark, pts)
    assert r[1] == (19, -1.0)
    assert r[2] == (18, 1.0)


def test_linear_trend_is_positively_correlated(spark):
    pts = [(t, t * 3) for t in range(30)]
    r = _acf(spark, pts, max_lag=2)
    assert r[1][1] == 1.0  # a lag of an exact linear series is linear in it
    assert r[2][1] == 1.0


def test_gaps_pair_with_nothing(spark):
    # days 0,1,2,5,6: lag-1 pairs are (0,1),(1,2),(5,6) only — no
    # imputation across the 2→5 gap.
    pts = [(0, 1), (1, 5), (2, 2), (5, 9), (6, 4)]
    r = _acf(spark, pts, max_lag=1)
    assert r[1][0] == 3


def test_constant_series_yields_null(spark):
    pts = [(t, 7) for t in range(10)]
    r = _acf(spark, pts, max_lag=2)
    assert r[1] == (9, None)
    assert r[2] == (8, None)


def test_lag_past_series_length_has_no_rows(spark):
    pts = [(0, 1), (1, 2)]
    out = autocorrelation(_series(spark, pts), max_lag=5).collect()
    # only lag 1 has any pair; empty lags simply don't appear (no
    # fabricated zero rows)
    assert [r["lag"] for r in out] == [1]


def test_duckdb_twin_parity(spark):
    pts = [(t, (t * 7919) % 101) for t in range(40) if t % 9 != 3]
    srows = [
        tuple(r)
        for r in autocorrelation(_series(spark, pts), max_lag=4).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE s (t BIGINT, y BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?)", pts)
    orows = [
        tuple(r)
        for r in con.execute(
            autocorrelation_sql("SELECT t, y FROM s", max_lag=4)
        ).fetchall()
    ]
    assert srows == orows


def test_max_lag_validated(spark):
    import pytest

    with pytest.raises(ValueError):
        autocorrelation(_series(spark, [(0, 1)]), max_lag=0)


def test_non_integer_series_floors_identically_on_both_engines(spark):
    # Spark's bigint cast truncates doubles, DuckDB's ::BIGINT rounds —
    # the operator floors on both sides, so a fractional series (mean
    # latency per day) cannot silently diverge between the twins.
    pts = [(float(t), 2.7 + t) for t in range(8)]
    df = spark.createDataFrame(pts, ["t", "y"])
    srows = [tuple(r) for r in autocorrelation(df, max_lag=2).collect()]
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE s (t DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?, ?)", pts)
    orows = [
        tuple(r)
        for r in con.execute(
            autocorrelation_sql("SELECT t, y FROM s", max_lag=2)
        ).fetchall()
    ]
    assert srows == orows
