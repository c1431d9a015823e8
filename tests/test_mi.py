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
