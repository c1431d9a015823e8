"""Bucketed tables: co-located joins run without a shuffle."""

import pytest
from pyspark.sql import functions as F

from scholarmind_spark.sinks.bucketed import read_table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(o, "orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
        "o_orderkey", buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    o = read_table(spark, "orders_b")
    l = read_table(spark, "lineitem_b")
    # sf0.001 tables fit the broadcast threshold, which would hide the
    # co-location; disable broadcast to expose the sort-merge path a big
    # fact⋈fact join takes at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, "o_orderkey").groupBy("o_orderstatus").agg(
            F.count("*").alias("n")
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-bucketed + co-sorted: the join subtree needs NO exchange (and no
    # sort — data is bucket-sorted on disk); the only exchange allowed is
    # for the final tiny groupBy on o_orderstatus
    join_section = plan.split("HashAggregate")[-1]  # below the agg = join subtree
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section


def test_bucketed_join_correct(spark, bucketed):
    o = read_table(spark, "orders_b")
    l = read_table(spark, "lineitem_b")
    got = l.join(o, "o_orderkey").count()
    want = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want
