from __future__ import annotations

import duckdb

from scholarmind_spark.operators.robust import weighted_median, weighted_median_sql


def _df(spark, rows):
    return spark.createDataFrame(rows, "g: string, v: double, w: bigint")


def test_known_weighted_median(spark):
    # total weight 10, half 5: cum 1(v=1),4(v=2),10(v=3) -> first >= is v=3? 2*4=8 >= 10? no; v=3: 20>=10 yes
    rows = [("a", 1.0, 1), ("a", 2.0, 3), ("a", 3.0, 6)]
    got = {r["g"]: r["wmedian"] for r in weighted_median(_df(spark, rows), "g", "v", "w").collect()}
    assert got == {"a": 3.0}


def test_equal_weights_match_plain_lower_median(spark):
    rows = [("a", float(v), 1) for v in (5, 1, 3, 2, 4)]
    got = weighted_median(_df(spark, rows), "g", "v", "w").collect()[0]["wmedian"]
    assert got == 3.0
    rows_even = [("b", float(v), 1) for v in (1, 2, 3, 4)]
    got = weighted_median(_df(spark, rows_even), "g", "v", "w").collect()[0]["wmedian"]
    assert got == 2.0  # lower median


def test_heavy_weight_dominates(spark):
    rows = [("a", 1.0, 100), ("a", 50.0, 1), ("a", 99.0, 1)]
    got = weighted_median(_df(spark, rows), "g", "v", "w").collect()[0]["wmedian"]
    assert got == 1.0


def test_ties_and_nulls(spark):
    rows = [("a", 2.0, 1), ("a", 2.0, 1), ("a", 2.0, 1), ("a", 9.0, 1),
            ("a", None, 5), ("b", 7.0, None), ("b", 4.0, 2)]
    got = {r["g"]: r["wmedian"] for r in weighted_median(_df(spark, rows), "g", "v", "w").collect()}
    assert got == {"a": 2.0, "b": 4.0}


def test_matches_duckdb_twin(spark, tmp_path):
    rows = [
        (f"g{i % 4}", float((i * 31) % 97), 1 + (i * 7) % 5) for i in range(200)
    ]
    df = _df(spark, rows)
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in weighted_median(df, "g", "v", "w").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(weighted_median_sql("t", "g", "v", "w")).fetchall())
    assert got == want and len(got) == 4
