from __future__ import annotations

import duckdb

from scholarmind_spark.operators.robust import winsorize, winsorize_sql


def _df(spark, rows):
    return spark.createDataFrame(rows, "event_id: bigint, g: string, value: double")


def test_outliers_clip_to_order_statistics(spark):
    # group of 100 values 1..100: k_lo = ceil(100*.01)=1 -> lo=1,
    # k_hi = ceil(100*.99)=99 -> hi=99; the 100 clips to 99.
    rows = [(i, "a", float(i)) for i in range(1, 101)]
    got = {r["event_id"]: r["value_w"] for r in
           winsorize(_df(spark, rows), "g", "value", ["event_id"]).collect()}
    assert got[100] == 99.0 and got[99] == 99.0 and got[1] == 1.0 and got[50] == 50.0


def test_custom_percentiles_and_small_group(spark):
    rows = [(i, "a", float(i)) for i in range(1, 5)]
    out = winsorize(
        _df(spark, rows), "g", "value", ["event_id"],
        p_lo_micro=250_000, p_hi_micro=750_000,
    ).collect()
    got = {r["event_id"]: r["value_w"] for r in out}
    # k_lo = ceil(4*.25)=1 -> lo=1; k_hi = ceil(4*.75)=3 -> hi=3
    assert got == {1: 1.0, 2: 2.0, 3: 3.0, 4: 3.0}


def test_groups_are_independent_and_nulls_dropped(spark):
    rows = [(1, "a", 5.0), (2, "a", 1000.0), (3, "b", -7.0), (4, "b", None)]
    out = winsorize(_df(spark, rows), "g", "value", ["event_id"]).collect()
    ids = {r["event_id"] for r in out}
    assert ids == {1, 2, 3}
    got = {r["event_id"]: r["value_w"] for r in out}
    assert got[3] == -7.0  # b's own (single-value) bounds


def test_matches_duckdb_twin(spark, tmp_path):
    rows = [
        (i, "g" + str(i % 3), float((i * 37) % 101) - 20.0) for i in range(200)
    ] + [(900, "g0", 1e9), (901, "g1", -1e9), (902, "g2", None)]
    df = _df(spark, rows)
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in winsorize(df, "g", "value", ["event_id"]).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(winsorize_sql("ev", "g", "value", ["event_id"])).fetchall())
    assert got == want and len(got) == 202


def _ev(spark, spec):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=s), u)
        for i, (u, s) in enumerate(spec)
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id"])


def test_interarrival_known_quantiles(spark):
    from scholarmind_spark.operators.robust import interarrival_quantiles

    # gaps for user 1: 10, 20, 30, 40 s -> n=4, k50=2 -> 20s, k90=4 -> 40s
    spec = [(1, 0), (1, 10), (1, 30), (1, 60), (1, 100)]
    r = interarrival_quantiles(_ev(spark, spec)).collect()[0]
    assert (r["n_gaps"], r["p50_gap_us"], r["p90_gap_us"]) == (
        4, 20_000_000, 40_000_000,
    )


def test_interarrival_min_gaps_filter(spark):
    from scholarmind_spark.operators.robust import interarrival_quantiles

    spec = [(1, 0), (1, 5), (2, 0), (2, 5), (2, 10), (2, 15)]
    got = {r["user_id"] for r in interarrival_quantiles(_ev(spark, spec)).collect()}
    assert got == {2}  # user 1 has only 1 gap


def test_interarrival_matches_duckdb(spark, tmp_path):
    import duckdb

    from scholarmind_spark.operators.robust import (
        interarrival_quantiles, interarrival_quantiles_sql,
    )

    spec = [(u, (i * 7) % 500 + u) for u in range(4) for i in range(25)]
    df = _ev(spark, spec)
    p = str(tmp_path / "ev.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in interarrival_quantiles(df).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(interarrival_quantiles_sql("ev")).fetchall())
    assert got == want and len(got) == 4


def test_mad_flags_outlier_mean_would_miss(spark):
    from scholarmind_spark.operators.robust import mad_outliers

    # 40% of the group is garbage (1000.0): the mean/σ fence is blown,
    # but median=10-ish and MAD stand
    vals = [10.0, 10.2, 9.9, 10.1, 9.8, 10.0] + [1000.0] * 4
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id: bigint, g: string, value: double")
    got = {r["event_id"]: r["outlier"] for r in
           mad_outliers(df, "g", "value", ["event_id"]).collect()}
    assert all(got[i] for i in range(6, 10))       # garbage flagged
    assert not any(got[i] for i in range(6))       # clean rows kept


def test_mad_constant_group_flags_any_deviation(spark):
    from scholarmind_spark.operators.robust import mad_outliers

    rows = [(i, "a", 5.0) for i in range(9)] + [(99, "a", 5.001)]
    df = spark.createDataFrame(rows, "event_id: bigint, g: string, value: double")
    got = {r["event_id"]: r["outlier"] for r in
           mad_outliers(df, "g", "value", ["event_id"]).collect()}
    # MAD = 0: any nonzero deviation exceeds 3*0
    assert got[99] is True and got[0] is False


def test_mad_matches_duckdb(spark, tmp_path):
    import duckdb

    from scholarmind_spark.operators.robust import mad_outliers, mad_outliers_sql

    rows = [(i, f"g{i % 3}", float((i * 53) % 211) / 3.0) for i in range(150)]
    df = spark.createDataFrame(rows, "event_id: bigint, g: string, value: double")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in mad_outliers(df, "g", "value", ["event_id"]).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(mad_outliers_sql("t", "g", "value", ["event_id"])).fetchall())
    assert got == want and len(got) == 150


# ----------------------------------------------- subsample stability CI

def test_subsample_ci_brackets_the_mean_and_is_deterministic(spark):
    from scholarmind_spark.operators.robust import subsample_metric_ci

    rows = [(i, float((i * 37) % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "val"])
    r1 = subsample_metric_ci(df, "id", "val", replicas=16).collect()[0].asDict()
    r2 = subsample_metric_ci(
        df.repartition(9), "id", "val", replicas=16
    ).collect()[0].asDict()
    assert r1 == r2  # partitioning cannot move a single milli
    assert r1["n_rows"] == 2000 and r1["n_replicas"] == 16
    assert r1["ci_lo_milli"] <= r1["mean_milli"] <= r1["ci_hi_milli"]
    assert 0 < r1["spread_milli"] < 10_000  # uniform 0..99: tight CI


def test_subsample_ci_duckdb_twin(spark):
    import duckdb

    from scholarmind_spark.operators.robust import (
        subsample_metric_ci,
        subsample_metric_ci_sql,
    )

    rows = [(i, ((i * 13) % 50) / 7.0) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "val"])
    srow = tuple(
        subsample_metric_ci(df, "id", "val", replicas=8).collect()[0]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, val DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    orow = con.execute(
        subsample_metric_ci_sql("t", "id", "val", replicas=8)
    ).fetchone()
    assert srow == orow


def test_subsample_ci_validates_replicas(spark):
    import pytest

    from scholarmind_spark.operators.robust import subsample_metric_ci

    df = spark.createDataFrame([(1, 1.0)], ["id", "val"])
    with pytest.raises(ValueError):
        subsample_metric_ci(df, "id", "val", replicas=2)


def test_degenerate_replica_count_yields_null_bounds(spark):
    """When fewer than 2 replicas keep any rows, the 2nd order
    statistics don't exist: CI bounds must come back NULL (never an
    index error under ANSI), on BOTH engines."""
    import duckdb

    from scholarmind_spark.operators.robust import (
        subsample_metric_ci,
        subsample_metric_ci_sql,
    )

    # one row whose id hashes so only ONE of the 4 replicas keeps it
    # (md5("x0:r") is even for r=2 only) → realized n_replicas == 1
    df = spark.createDataFrame([("x0", 5.0)], ["id", "val"])
    row = subsample_metric_ci(df, "id", "val", replicas=4).collect()[0]
    assert row["n_rows"] == 1 and row["n_replicas"] <= 1
    assert row["ci_lo_milli"] is None and row["ci_hi_milli"] is None

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id VARCHAR, val DOUBLE)")
    con.execute("INSERT INTO t VALUES ('x0', 5.0)")
    orow = con.execute(
        subsample_metric_ci_sql("t", "id", "val", replicas=4)
    ).fetchone()
    assert tuple(row) == tuple(orow)
