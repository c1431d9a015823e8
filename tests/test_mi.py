from __future__ import annotations

import math

import duckdb

from scholarmind_spark.operators.mi import mutual_information, mutual_information_sql


def test_independent_columns_give_zero(spark):
    # X uniform over {a,b}, Y uniform over {0,1}, all 4 cells equal
    rows = [(x, y) for x in "ab" for y in (0, 1) for _ in range(25)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = mutual_information(df, "x", "y").collect()[0]
    assert (r["n_rows"], r["n_cells"], r["mi_micro"]) == (100, 4, 0)


def test_identical_columns_give_entropy(spark):
    # Y == X with p = (0.5, 0.25, 0.25): I(X;X) = H(X) = 1.5 ln 2 nats
    rows = [("a", "a")] * 50 + [("b", "b")] * 25 + [("c", "c")] * 25
    df = spark.createDataFrame(rows, ["x", "y"])
    r = mutual_information(df, "x", "y").collect()[0]
    want = round(1.5 * math.log(2) * 1e6)
    assert abs(r["mi_micro"] - want) <= 2  # per-cell micro rounding slack


def test_nulls_are_excluded(spark):
    rows = [("a", 1), ("a", None), (None, 1), ("b", 2)]
    df = spark.createDataFrame(rows, "x: string, y: int")
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["n_rows"] == 2 and r["n_cells"] == 2


def test_matches_duckdb_twin(spark, tmp_path):
    # y = i % 6 is a refinement of x = i % 3 — strongly dependent
    rows = [(f"t{i % 3}", i % 6 if i % 7 else 0) for i in range(300)]
    df = spark.createDataFrame(rows, "x: string, y: bigint")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = tuple(mutual_information(df, "x", "y").collect()[0])
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    want = con.sql(mutual_information_sql("t", "x", "y")).fetchall()[0]
    assert got == want and got[2] > 0


def test_drift_kl_zero_for_identical_slices(spark):
    from scholarmind_spark.operators.mi import drift_kl

    rows = [(g, t) for g in ("d1", "d2") for t in ("a", "a", "b")]
    df = spark.createDataFrame(rows, ["g", "t"])
    out = {r["grp"]: r["kl_micro"] for r in drift_kl(df, "g", "t").collect()}
    assert out == {"d1": 0, "d2": 0}


def test_drift_kl_flags_shifted_slice(spark):
    import math

    from scholarmind_spark.operators.mi import drift_kl

    # d1 matches overall-ish; d2 is all-"b" — its KL must dominate
    rows = [("d1", "a")] * 50 + [("d1", "b")] * 50 + [("d2", "b")] * 100
    df = spark.createDataFrame(rows, ["g", "t"])
    out = {r["grp"]: r["kl_micro"] for r in drift_kl(df, "g", "t").collect()}
    assert out["d2"] > out["d1"] > 0
    # d2 exact: all mass on b, q(b)=150/200 -> KL = ln(200/150)
    assert abs(out["d2"] - round(math.log(200 / 150) * 1e6)) <= 2


def test_drift_kl_matches_duckdb(spark, tmp_path):
    from scholarmind_spark.operators.mi import drift_kl, drift_kl_sql

    rows = [(f"d{i % 5}", f"t{(i * i) % 4}") for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "t"])
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in drift_kl(df, "g", "t").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(drift_kl_sql("t", "g", "t")).fetchall())
    assert got == want and len(got) == 5


# ------------------------------------------------------------------ PSI

def test_psi_zero_for_identical_distributions(spark):
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.mi import psi_bins

    # same value multiset on both sides → every bin term is exactly 0
    rows = [(float(i % 20), c) for i in range(400) for c in (True, False)]
    df = spark.createDataFrame(rows, ["v", "cur"])
    out = psi_bins(df, "v", F.col("cur"), bins=10).collect()
    assert all(r["psi_micro"] == 0 for r in out)
    assert sum(r["n_ref"] for r in out) == 400


def test_psi_flags_a_shifted_distribution(spark):
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.mi import psi_bins

    # reference uniform 0..49; current shifted to 50..99 → huge PSI
    rows = [(float(i % 50), False) for i in range(500)] + [
        (50.0 + (i % 50), True) for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["v", "cur"])
    total = sum(
        r["psi_micro"]
        for r in psi_bins(df, "v", F.col("cur"), bins=10).collect()
    )
    # industry rule of thumb: > 0.25 (250_000 micro) = major shift
    assert total > 250_000


def test_psi_duckdb_twin(spark):
    import duckdb

    from pyspark.sql import functions as F

    from scholarmind_spark.operators.mi import psi_bins, psi_bins_sql

    rows = [(((i * 13) % 97) / 3.0, i % 3 == 0) for i in range(300)]
    df = spark.createDataFrame(rows, ["v", "cur"])
    srows = [
        tuple(r) for r in psi_bins(df, "v", F.col("cur"), bins=8).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE, cur BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    orows = con.execute(psi_bins_sql("t", "v", "cur", bins=8)).fetchall()
    assert srows == orows


def test_psi_drops_non_finite_values_on_both_engines(spark):
    import duckdb
    import math

    from pyspark.sql import functions as F

    from scholarmind_spark.operators.mi import psi_bins, psi_bins_sql

    rows = [(1.0, False), (2.0, True), (float("nan"), False),
            (float("inf"), True), (3.0, False), (4.0, True)]
    df = spark.createDataFrame(rows, ["v", "cur"])
    srows = [tuple(r) for r in psi_bins(df, "v", F.col("cur"), bins=4).collect()]
    assert sum(r[1] + r[2] for r in srows) == 4  # NaN/Inf excluded
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE, cur BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    orows = con.execute(psi_bins_sql("t", "v", "cur", bins=4)).fetchall()
    assert srows == orows  # DuckDB would raise on the cast without the filter


def test_psi_bins_validated(spark):
    import duckdb
    import pytest

    from pyspark.sql import functions as F

    from scholarmind_spark.operators.mi import psi_bins, psi_bins_sql

    df = spark.createDataFrame([(1.0, True)], ["v", "cur"])
    with pytest.raises(ValueError):
        psi_bins(df, "v", F.col("cur"), bins=0)
    with pytest.raises(ValueError):
        psi_bins_sql("t", "v", "cur", bins=0)
