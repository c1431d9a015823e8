"""The documented 100×-scale swap path: approximate sketches stay within
their error bounds of the exact aggregates they replace.

The gate queries use exact countDistinct/percentile so DuckDB can verify
values bit-for-bit; at the 100 TB boundary those swap to
approx_count_distinct (HLL++) and percentile_approx (KLL-ish) — this
test pins the swap's accuracy so the claim isn't just a docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark):
    from scholarmind_spark.queries import _events

    e = _events(spark, "/root/testdata/sf0.01")
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_close_to_exact(spark):
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01
