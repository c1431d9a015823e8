"""Skew helpers: result-equivalence with the plain operators."""

from pyspark.sql import functions as F

from scholarmind_spark.operators.skew import salted_join, two_phase_distinct_count


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share key 0
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 2000, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    plain = big.join(small, "k").select("k", "payload", "dim")
    salted = salted_join(big, small, "k", buckets=4).select("k", "payload", "dim")
    assert _canon(salted) == _canon(plain)


def test_two_phase_distinct_count(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = _canon(two_phase_distinct_count(e, "event_type", "user_id"))
    want = _canon(
        e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_distinct"))
    )
    assert got == want


def test_plan_digest_counts(spark):
    from pyspark.sql import functions as F

    from scholarmind_spark.plans import plan_digest

    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    j = l.filter(F.col("l_quantity") > 10).join(
        F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey")
    )
    d = plan_digest(j)
    assert d["joins"] == ["BroadcastHashJoin"]
    assert d["pushed_filters"] >= 1
    assert d["python_stages"] == 0


def test_skew_report_known_distribution(spark):
    from scholarmind_spark.operators.skew import skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [(f"c{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, ["k"])
    r = skew_report(df, "k", top_k=2).collect()[0]
    assert r["n_keys"] == 12 and r["n_rows"] == 100
    assert r["max_freq"] == 60
    # mean = 100/12 ≈ 8.33 -> max/mean = 7.2 -> 7200 permille (int floor)
    assert r["skew_permille"] == 60 * 12 * 1000 // 100
    assert r["hot_keys"] == ["hot", "warm"] and r["hot_freqs"] == [60, 30]


def test_skew_report_matches_duckdb(spark, tmp_path):
    import duckdb

    from scholarmind_spark.operators.skew import skew_report, skew_report_sql

    rows = [(i % 7,) for i in range(100)] + [(99,)] * 40
    df = spark.createDataFrame(rows, "k: bigint")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    r = skew_report(df, "k", top_k=3).collect()[0]
    got = (r["n_keys"], r["n_rows"], r["max_freq"], r["skew_permille"],
           list(r["hot_keys"]), list(r["hot_freqs"]))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    w = con.sql(skew_report_sql("t", "k", top_k=3)).fetchall()[0]
    assert got == (w[0], w[1], w[2], w[3], list(w[4]), list(w[5]))
