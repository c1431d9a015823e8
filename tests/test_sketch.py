"""KMV sketch tests: prefilter/definition equivalence, exact small-set
branch, estimator accuracy envelope, overlap on constructed sets, and
DuckDB twin parity on data with NULLs and cross-partition duplicates."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from scholarmind_spark.operators.sketch import (
    kmv_distinct_report,
    kmv_distinct_report_sql,
    kmv_minima,
    kmv_overlap_report,
    kmv_overlap_report_sql,
)


def _vals(spark, values, partitions=7):
    return spark.createDataFrame(
        [(v,) for v in values], ["v"]
    ).repartition(partitions)


def test_prefilter_matches_semantic_definition(spark):
    # duplicates deliberately spread across partitions: the per-partition
    # mapInPandas partial and the pure-Catalyst distinct-top-k must agree
    vals = [f"x{i % 50}" for i in range(400)]
    df = _vals(spark, vals)
    fast = [r["h"] for r in kmv_minima(df, "v", k=16, prefilter=True).collect()]
    slow = [r["h"] for r in kmv_minima(df, "v", k=16, prefilter=False).collect()]
    assert fast == slow
    assert len(fast) == 16
    assert fast == sorted(fast)


def test_small_set_is_exact(spark):
    df = _vals(spark, [f"v{i}" for i in range(10)] * 3)
    row = kmv_distinct_report(df, "v", k=256).collect()[0]
    assert row["n_minima"] == 10
    assert row["est_distinct"] == 10  # n_min < k → exact branch


def test_nulls_are_not_set_members(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], ["v"]
    )
    row = kmv_distinct_report(df, "v", k=8).collect()[0]
    assert row["est_distinct"] == 2


def test_estimator_error_envelope(spark):
    # 5000 distinct, k=256: std error ≈ 1/√k ≈ 6%; 25% is a ~4σ bound —
    # deterministic fixture, so this either always passes or never does.
    df = _vals(spark, [f"key-{i}" for i in range(5000)], partitions=11)
    row = kmv_distinct_report(df, "v", k=256).collect()[0]
    assert row["n_minima"] == 256
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.25


def test_overlap_constructed_thirds(spark):
    # A = 0..999, B = 500..1499 → true Jaccard = 500/1500 = 1/3
    a = _vals(spark, [f"u{i}" for i in range(1000)])
    b = _vals(spark, [f"u{i}" for i in range(500, 1500)])
    row = kmv_overlap_report(a, b, "v", k=256).collect()[0]
    assert row["n_union_minima"] == 256
    assert 0 < row["n_common"] < 256
    assert abs(row["jaccard_est"] - 1 / 3) < 0.15
    assert 0 < row["est_intersection"] < row["est_union"]


def test_distinct_report_duckdb_twin(spark):
    vals = [f"t{i % 97}" for i in range(300)] + [None, None]
    df = spark.createDataFrame([(v,) for v in vals], ["v"]).repartition(5)
    srow = kmv_distinct_report(df, "v", k=32).collect()[0].asDict()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tv (v VARCHAR)"
    )
    con.executemany("INSERT INTO tv VALUES (?)", [(v,) for v in vals])
    orow = (
        con.execute(kmv_distinct_report_sql("SELECT v FROM tv", k=32))
        .df()
        .iloc[0]
        .to_dict()
    )
    assert srow["n_minima"] == orow["n_minima"]
    assert srow["kth_hash"] == orow["kth_hash"]
    assert srow["est_distinct"] == orow["est_distinct"]


def test_overlap_report_duckdb_twin(spark):
    va = [f"a{i}" for i in range(200)] + [f"c{i}" for i in range(100)]
    vb = [f"b{i}" for i in range(150)] + [f"c{i}" for i in range(100)]
    a = _vals(spark, va)
    b = _vals(spark, vb)
    srow = kmv_overlap_report(a, b, "v", k=64).collect()[0].asDict()

    con = duckdb.connect()
    con.execute("CREATE TABLE ta (v VARCHAR); CREATE TABLE tb (v VARCHAR)")
    con.executemany("INSERT INTO ta VALUES (?)", [(v,) for v in va])
    con.executemany("INSERT INTO tb VALUES (?)", [(v,) for v in vb])
    orow = (
        con.execute(
            kmv_overlap_report_sql(
                "SELECT v FROM ta", "SELECT v FROM tb", k=64
            )
        )
        .df()
        .iloc[0]
        .to_dict()
    )
    for c in (
        "n_union_minima",
        "n_common",
        "jaccard_est",
        "est_union",
        "est_intersection",
    ):
        assert srow[c] == orow[c], c


def test_k_lower_bound_rejected(spark):
    import pytest

    df = _vals(spark, ["a"])
    with pytest.raises(ValueError):
        kmv_minima(df, "v", k=1)


# ---------------------------------------------------- count-min sketch

def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    from scholarmind_spark.operators.sketch import cms_build, cms_estimate

    vals = [f"t{i % 20}" for i in range(300)]  # t0..t19, 15 each
    df = _vals(spark, vals)
    # wide sketch: 20 keys in 4x1024 cells → no collisions → exact
    cells = cms_build(df, "v", width=1024, depth=4)
    est = cms_estimate(cells, df.select("v").distinct(), "v", width=1024, depth=4)
    assert {r["key"]: r["cms_est"] for r in est.collect()} == {
        f"t{i}": 15 for i in range(20)
    }
    # narrow sketch: collisions forced → one-sided error only
    cells_n = cms_build(df, "v", width=4, depth=4)
    est_n = cms_estimate(cells_n, df.select("v").distinct(), "v", width=4, depth=4)
    for r in est_n.collect():
        assert r["cms_est"] >= 15


def test_cms_duckdb_twin(spark):
    import duckdb

    from scholarmind_spark.operators.sketch import (
        cms_build,
        cms_build_sql,
        cms_estimate,
        cms_estimate_sql,
    )

    vals = [f"k{(i * 7) % 13}" for i in range(200)]
    df = _vals(spark, vals, partitions=5)
    cells = cms_build(df, "v", width=8, depth=3)
    est = cms_estimate(cells, df.select("v"), "v", width=8, depth=3)
    srows = sorted(tuple(r) for r in est.collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE tv (v VARCHAR)")
    con.executemany("INSERT INTO tv VALUES (?)", [(v,) for v in vals])
    q = cms_estimate_sql(
        cms_build_sql("SELECT v FROM tv", width=8, depth=3),
        "SELECT v FROM tv",
        width=8,
        depth=3,
    )
    orows = sorted(con.execute(q).fetchall())
    assert srows == orows


def test_cms_depth_validated(spark):
    import pytest

    from scholarmind_spark.operators.sketch import cms_build, cms_build_sql

    df = _vals(spark, ["a"])
    with pytest.raises(ValueError):
        cms_build(df, "v", depth=9)
    with pytest.raises(ValueError):
        cms_build_sql("SELECT v FROM t", depth=9)


def test_cms_width_validated(spark):
    """width < 1 must fail loudly (modulo-by-zero would otherwise make
    NULL buckets — a silently empty sketch), on all four entry points."""
    import pytest

    from scholarmind_spark.operators.sketch import (
        cms_build,
        cms_build_sql,
        cms_estimate,
        cms_estimate_sql,
    )

    df = _vals(spark, ["a"])
    for bad in (0, -4):
        with pytest.raises(ValueError):
            cms_build(df, "v", width=bad)
        with pytest.raises(ValueError):
            cms_build_sql("SELECT v FROM t", width=bad)
        with pytest.raises(ValueError):
            cms_estimate(df, df, "v", width=bad)
        with pytest.raises(ValueError):
            cms_estimate_sql("SELECT 1", "SELECT v FROM t", width=bad)


def test_cms_estimate_drops_null_keys_and_validates_depth(spark):
    import pytest

    from scholarmind_spark.operators.sketch import cms_build, cms_estimate

    vals = ["a", "a", "b"]
    df = _vals(spark, vals, partitions=2)
    cells = cms_build(df, "v", width=8, depth=3)
    keys = spark.createDataFrame([("a",), ("b",), (None,)], ["v"])
    est = {r["key"]: r["cms_est"] for r in
           cms_estimate(cells, keys, "v", width=8, depth=3).collect()}
    assert est == {"a": 2, "b": 1}  # no spurious (None, 0) row
    with pytest.raises(ValueError):
        cms_estimate(cells, keys, "v", width=8, depth=9)


def test_cms_join_size_upper_bound_and_exact_when_wide(spark):
    from scholarmind_spark.operators.sketch import (
        cms_build,
        cms_join_size_estimate,
    )

    # A: key i appears i+1 times (i=0..9); B: key i appears 2 times for
    # even i → exact join size = Σ_{even i} (i+1)*2 = 2*(1+3+5+7+9) = 50
    va = [f"k{i}" for i in range(10) for _ in range(i + 1)]
    vb = [f"k{i}" for i in range(0, 10, 2) for _ in range(2)]
    a, b = _vals(spark, va), _vals(spark, vb)
    wide_a = cms_build(a, "v", width=2048, depth=4)
    wide_b = cms_build(b, "v", width=2048, depth=4)
    est = cms_join_size_estimate(wide_a, wide_b).collect()[0]["est_join_size"]
    assert est == 50  # no collisions at this width → exact
    # narrow: one-sided only
    na_, nb_ = cms_build(a, "v", width=4, depth=4), cms_build(b, "v", width=4, depth=4)
    est_n = cms_join_size_estimate(na_, nb_).collect()[0]["est_join_size"]
    assert est_n >= 50


def test_cms_join_size_empty_join_is_zero(spark):
    from scholarmind_spark.operators.sketch import (
        cms_build,
        cms_join_size_estimate,
    )

    a = cms_build(_vals(spark, ["a", "b"]), "v", width=2048, depth=4)
    b = cms_build(_vals(spark, ["x", "y"]), "v", width=2048, depth=4)
    est = cms_join_size_estimate(a, b).collect()[0]["est_join_size"]
    assert est == 0


def test_cms_join_size_duckdb_twin(spark):
    import duckdb

    from scholarmind_spark.operators.sketch import (
        cms_build,
        cms_build_sql,
        cms_join_size_estimate,
        cms_join_size_estimate_sql,
    )

    va = [f"u{i % 7}" for i in range(50)]
    vb = [f"u{i % 11}" for i in range(80)]
    sa = cms_build(_vals(spark, va), "v", width=16, depth=3)
    sb = cms_build(_vals(spark, vb), "v", width=16, depth=3)
    s_est = cms_join_size_estimate(sa, sb).collect()[0]["est_join_size"]
    con = duckdb.connect()
    con.execute("CREATE TABLE ta (v VARCHAR); CREATE TABLE tb (v VARCHAR)")
    con.executemany("INSERT INTO ta VALUES (?)", [(v,) for v in va])
    con.executemany("INSERT INTO tb VALUES (?)", [(v,) for v in vb])
    o_est = con.execute(
        cms_join_size_estimate_sql(
            cms_build_sql("SELECT v FROM ta", width=16, depth=3),
            cms_build_sql("SELECT v FROM tb", width=16, depth=3),
        )
    ).fetchone()[0]
    assert s_est == o_est
    # non-vacuous: the depth is inferred from the depth-3 sketches (a
    # stale caller-supplied depth=4 used to hard-zero this) and the
    # one-sided bound holds against the exact join size
    exact = sum(va.count(k) * vb.count(k) for k in set(va))
    assert s_est >= exact > 0


def test_cms_rows_are_independent_and_depth_tightens(spark):
    # regression for the XOR-relabeling defect: at a power-of-2 width the
    # per-row collision patterns must DIFFER (salted hashes), so a deeper
    # sketch's min is no worse and strictly better for some key
    import duckdb

    from scholarmind_spark.operators.sketch import (
        cms_build_sql,
        cms_estimate_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE tv (v VARCHAR)")
    con.executemany(
        "INSERT INTO tv VALUES (?)", [(f"k{i % 40}",) for i in range(400)]
    )

    def est(depth):
        q = cms_estimate_sql(
            cms_build_sql("SELECT v FROM tv", width=8, depth=depth),
            "SELECT v FROM tv",
            width=8,
            depth=depth,
        )
        return dict(con.execute(q).fetchall())

    e1, e4 = est(1), est(4)
    assert all(e4[k] <= e1[k] for k in e1)
    assert any(e4[k] < e1[k] for k in e1), (
        "depth-4 min never beat depth-1 — rows are not independent"
    )


def test_cms_join_size_zero_at_non_power_of_two_width(spark):
    # regression: the inner-join min used to drop zero-dot rows, returning
    # a positive estimate for a provably-empty join at widths where only
    # SOME rows collide
    from scholarmind_spark.operators.sketch import (
        cms_build,
        cms_join_size_estimate,
    )

    a = cms_build(_vals(spark, ["k0"]), "v", width=5, depth=4)
    b = cms_build(_vals(spark, ["k2"]), "v", width=5, depth=4)
    est = cms_join_size_estimate(a, b).collect()[0]["est_join_size"]
    assert est == 0


# ------------------------------------------------------- mergeability

def test_kmv_merge_equals_direct(spark):
    from scholarmind_spark.operators.sketch import kmv_merge, kmv_minima

    va = [f"a{i}" for i in range(300)]
    vb = [f"b{i}" for i in range(250)] + [f"a{i}" for i in range(100)]
    a, b = _vals(spark, va), _vals(spark, vb)
    merged = [
        r["h"]
        for r in kmv_merge(
            kmv_minima(a, "v", 64), kmv_minima(b, "v", 64), 64
        ).collect()
    ]
    direct = [
        r["h"] for r in kmv_minima(_vals(spark, va + vb), "v", 64).collect()
    ]
    assert merged == direct  # mergeability is EXACT, not approximate


def test_cms_merge_equals_direct(spark):
    from scholarmind_spark.operators.sketch import cms_build, cms_merge

    va = [f"k{i % 9}" for i in range(90)]
    vb = [f"k{i % 13}" for i in range(130)]
    merged = cms_merge(
        cms_build(_vals(spark, va), "v", width=8, depth=3),
        cms_build(_vals(spark, vb), "v", width=8, depth=3),
    )
    direct = cms_build(_vals(spark, va + vb), "v", width=8, depth=3)
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )
