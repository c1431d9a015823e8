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
