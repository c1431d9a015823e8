"""Z-order layout tests: Morton-value bit math, DuckDB twin parity,
row preservation under re-layout, and the locality contrast the curve
exists for."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from scholarmind_spark.operators.zorder import (
    layout_by_zorder,
    zorder_locality_report,
    zorder_locality_report_sql,
    zvalue,
    zvalue_sql,
)


def _z(spark, x, y, bits=16):
    df = spark.createDataFrame([(x, y)], ["x", "y"])
    return df.select(
        zvalue(F.col("x"), F.col("y"), bits).alias("z")
    ).collect()[0]["z"]


def test_zvalue_known_interleavings(spark):
    # x fills even bit positions, y odd: z(1,0)=1, z(0,1)=2, z(3,3)=15,
    # z(5,3) = 1+2+8+16 = 27
    assert _z(spark, 0, 0) == 0
    assert _z(spark, 1, 0) == 1
    assert _z(spark, 0, 1) == 2
    assert _z(spark, 3, 3) == 15
    assert _z(spark, 5, 3) == 27


def test_zvalue_clamps_to_bits(spark):
    # 4-bit clamp: x=17 ≡ 1 (mod 16)
    assert _z(spark, 17, 0, bits=4) == _z(spark, 1, 0, bits=4)


def test_zvalue_duckdb_twin(spark):
    pts = [(x, y) for x in range(0, 40, 7) for y in range(0, 40, 11)]
    df = spark.createDataFrame(pts, ["x", "y"])
    srows = sorted(
        tuple(r)
        for r in df.select(
            "x", "y", zvalue(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE p (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    orows = sorted(
        con.execute(
            f"SELECT x, y, {zvalue_sql('x', 'y', 8)} AS z FROM p"
        ).fetchall()
    )
    assert srows == orows


def test_layout_preserves_rows(spark):
    pts = [(i % 50, (i * 7) % 40, f"v{i}") for i in range(400)]
    df = spark.createDataFrame(pts, ["x", "y", "payload"])
    out = layout_by_zorder(df, "x", "y", partitions=4, bits=8)
    assert sorted(tuple(r) for r in out.collect()) == sorted(pts)
    assert out.columns == ["x", "y", "payload"]


def test_locality_report_contrast_on_uniform_grid(spark):
    # 32x32 uniform grid: an x-sort bucket spans the FULL y range; a
    # z-bucket must stay narrow in both dimensions
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, ["x", "y"])
    rep = zorder_locality_report(df, "x", "y", buckets=16, bits=5)
    rows = {(r["strategy"], r["bucket"]): r for r in rep.collect()}
    x_spans = [r["x_span"] for (s, _), r in rows.items() if s == "zorder"]
    y_spans = [r["y_span"] for (s, _), r in rows.items() if s == "zorder"]
    assert max(x_spans) <= 15 and max(y_spans) <= 15  # < half of 31
    xsort_y = [r["y_span"] for (s, _), r in rows.items() if s == "xsort"]
    assert all(v == 31 for v in xsort_y)  # x-sort never narrows y


def test_locality_report_duckdb_twin(spark):
    pts = [((i * 13) % 64, (i * 29) % 64) for i in range(300)]
    df = spark.createDataFrame(pts, ["x", "y"])
    srows = [
        tuple(r)
        for r in zorder_locality_report(df, "x", "y", buckets=8, bits=6).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE p (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    orows = [
        tuple(r)
        for r in con.execute(
            zorder_locality_report_sql("p", "x", "y", buckets=8, bits=6)
        ).fetchall()
    ]
    assert srows == orows


def test_zvalue_bits_validated(spark):
    import pytest

    with pytest.raises(ValueError):
        _z(spark, 1, 1, bits=32)
    with pytest.raises(ValueError):
        zvalue_sql("x", "y", 0)


def test_layout_survives_int32_keys_with_wide_range(spark):
    # int32 inputs with range >= 2^(31-bits) overflowed the scaling
    # multiply before the bigint cast (ANSI runtime error); the layout
    # must handle them
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("x", T.IntegerType()), T.StructField("y", T.IntegerType())]
    )
    pts = [(i * 1000, (80000 - i * 1000)) for i in range(81)]
    df = spark.createDataFrame(pts, schema)
    out = layout_by_zorder(df, "x", "y", partitions=4, bits=16)
    assert sorted(tuple(r) for r in out.collect()) == sorted(pts)
