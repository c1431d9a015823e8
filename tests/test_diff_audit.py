from __future__ import annotations

import duckdb

from scholarmind_spark.operators.audit import fk_integrity_audit, fk_integrity_audit_sql
from scholarmind_spark.operators.diff import snapshot_diff, snapshot_diff_sql


def test_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, None), (5, "e")], ["k", "v"]
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 removed, 2 unchanged (absent), 3 changed, 4 unchanged null-safe, 5 added
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_diff_null_to_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k: bigint, v: string")
    new = spark.createDataFrame([(1, "x")], "k: bigint, v: string")
    got = [r["status"] for r in snapshot_diff(old, new, ["k"]).collect()]
    assert got == ["changed"]


def test_diff_composite_key_and_subset_columns(spark):
    old = spark.createDataFrame([(1, "x", "p", 10)], ["k1", "k2", "v", "w"])
    new = spark.createDataFrame([(1, "x", "p", 99)], ["k1", "k2", "v", "w"])
    assert snapshot_diff(old, new, ["k1", "k2"], ["v"]).count() == 0
    got = snapshot_diff(old, new, ["k1", "k2"], ["w"]).collect()
    assert [(r["k1"], r["k2"], r["status"]) for r in got] == [(1, "x", "changed")]


def test_diff_matches_duckdb_twin(spark, tmp_path):
    old = spark.createDataFrame(
        [(i, f"v{i % 4}") for i in range(20)], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(i, f"v{(i + (i % 5 == 0)) % 4}") for i in range(2, 24)], ["k", "v"]
    )
    po, pn = str(tmp_path / "o.parquet"), str(tmp_path / "n.parquet")
    old.coalesce(1).write.parquet(po)
    new.coalesce(1).write.parquet(pn)
    got = {(r["k"], r["status"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    con = duckdb.connect()
    want = set(
        con.sql(
            snapshot_diff_sql(
                f"SELECT * FROM '{po}/*.parquet'",
                f"SELECT * FROM '{pn}/*.parquet'",
                ["k"],
                ["v"],
            )
        ).fetchall()
    )
    assert got == want and got


def test_fk_audit_counts(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id: bigint, fk: bigint"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk: bigint")
    rows = fk_integrity_audit([("c->p", child, "fk", parent, "pk")]).collect()
    r = rows[0]
    assert (r["relationship"], r["n_child"], r["n_null_fk"], r["n_orphans"]) == (
        "c->p", 4, 1, 1
    )


def test_fk_audit_matches_duckdb_twin(spark, tmp_path):
    child = spark.createDataFrame(
        [(i, i % 7 if i % 11 else None) for i in range(50)],
        "id: bigint, fk: bigint",
    )
    parent = spark.createDataFrame([(i,) for i in range(5)], "pk: bigint")
    pc, pp = str(tmp_path / "c.parquet"), str(tmp_path / "p.parquet")
    child.coalesce(1).write.parquet(pc)
    parent.coalesce(1).write.parquet(pp)
    got = [tuple(r) for r in fk_integrity_audit(
        [("c->p", child, "fk", parent, "pk")]
    ).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW c AS SELECT * FROM '{pc}/*.parquet'")
    con.sql(f"CREATE VIEW p AS SELECT * FROM '{pp}/*.parquet'")
    want = con.sql(
        fk_integrity_audit_sql([("c->p", "c", "fk", "p", "pk")])
    ).fetchall()
    assert got == want


def test_fd_audit_detects_violations(spark):
    from scholarmind_spark.operators.audit import fd_audit

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, None), (None, "x")],
        "l: bigint, r: string",
    )
    r = fd_audit(df, "l", "r").collect()[0]
    # lhs nulls excluded; lhs=2 maps to {a,b}; lhs=3 -> {NULL} is fine
    assert (r["n_lhs"], r["n_violating"], r["max_fanout"]) == (3, 1, 2)
    assert r["violation_permille"] == (1 * 1000 + 1) // 3


def test_fd_audit_holds_for_true_dependency(spark):
    from scholarmind_spark.operators.audit import fd_audit, fd_audit_sql
    import duckdb

    df = spark.createDataFrame([(i, i % 5) for i in range(50)], "l: bigint, r: bigint")
    r = fd_audit(df, "l", "r").collect()[0]
    assert r["n_violating"] == 0 and r["max_fanout"] == 1


def test_benford_natural_vs_uniform(spark):
    from scholarmind_spark.operators.audit import benford_audit

    # powers-of-2 sequence follows Benford closely; constant-leading-5
    # values are maximally non-Benford
    natural = [("nat", float(2 ** i % 10**9 or 1)) for i in range(1, 120)]
    flat = [("flat", 5.0 + i / 1000.0) for i in range(120)]
    df = spark.createDataFrame(natural + flat, "g: string, v: double")
    out = {r["g"]: r for r in benford_audit(df, "g", "v").collect()}
    assert out["flat"]["chi2_micro"] > 10 * out["nat"]["chi2_micro"]
    assert out["nat"]["n"] == 119 and out["flat"]["n"] == 120


def test_benford_digit_extraction_and_exclusions(spark):
    from scholarmind_spark.operators.audit import benford_audit

    # 0 and NULL excluded; 0.004 and 400 both have first digit 4
    df = spark.createDataFrame(
        [("g", 0.004), ("g", 400.0), ("g", 0.0), ("g", None), ("g", -73.2)],
        "g: string, v: double",
    )
    r = benford_audit(df, "g", "v").collect()[0]
    assert r["n"] == 3  # 0.004, 400, -73.2


def test_benford_matches_duckdb(spark, tmp_path):
    import duckdb

    from scholarmind_spark.operators.audit import benford_audit, benford_audit_sql

    rows = [(f"g{i % 2}", float((i * 37) % 997) / 7.0 + 0.01) for i in range(300)]
    df = spark.createDataFrame(rows, "g: string, v: double")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in benford_audit(df, "g", "v").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(benford_audit_sql("t", "g", "v")).fetchall())
    assert got == want and len(got) == 2


def test_benford_subnormal_nan_inf_match_duckdb(spark, tmp_path):
    """Values whose 9-decimal rendering has no significant digit (|v| <
    5e-10, NaN, inf) must be excluded identically on both engines: the
    un-guarded oracle raised on ''::INT while Spark silently counted the
    row in n."""
    import duckdb

    from scholarmind_spark.operators.audit import benford_audit, benford_audit_sql

    rows = [("g", 1.23), ("g", 45.6), ("g", 7.0), ("g", 891.0), ("g", 2.0),
            ("g", 1e-12), ("g", -4e-10), ("g", float("nan")), ("g", float("inf"))]
    df = spark.createDataFrame(rows, "g: string, v: double")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in benford_audit(df, "g", "v").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(benford_audit_sql("t", "g", "v")).fetchall())
    assert got == want
    # n counts only the 5 rows with a real first significant digit
    assert next(iter(got))[1] == 5


# ------------------------------------------------------- k-anonymity

def _kanon(spark, rows, qi, k=5):
    from scholarmind_spark.operators.audit import k_anonymity_report

    df = spark.createDataFrame(rows, ["seg", "nat", "extra"])
    out = k_anonymity_report(df, qi, k=k).collect()
    return {r["risk_rank"]: r.asDict() for r in out}


def test_k_anonymity_bands(spark):
    # classes: ('a',1)x1, ('a',2)x1, ('b',1)x3, ('c',1)x7  → unique: 2
    # classes/2 rows; small: 1 class/3 rows; anonymous: 1 class/7 rows
    rows = (
        [("a", 1, 0), ("a", 2, 0)]
        + [("b", 1, i) for i in range(3)]
        + [("c", 1, i) for i in range(7)]
    )
    bands = _kanon(spark, rows, ["seg", "nat"], k=5)
    assert bands[1]["n_classes"] == 2 and bands[1]["n_records"] == 2
    assert bands[2]["n_classes"] == 1 and bands[2]["n_records"] == 3
    assert bands[3]["n_classes"] == 1 and bands[3]["n_records"] == 7
    assert bands[1]["pct_records"] == round(100 * 2 / 12, 2)
    assert sum(b["n_records"] for b in bands.values()) == 12


def test_k_anonymity_null_qi_is_its_own_class(spark):
    # two NULL-segment rows group together (one class of 2), not with
    # everything — groupBy null-safe semantics
    rows = [(None, 1, 0), (None, 1, 1), ("a", 1, 0)]
    bands = _kanon(spark, rows, ["seg", "nat"], k=2)
    assert bands[1]["n_records"] == 1  # only ('a',1)
    assert bands[3]["n_classes"] == 1 and bands[3]["n_records"] == 2


def test_k_anonymity_validates_inputs(spark):
    import pytest

    from scholarmind_spark.operators.audit import k_anonymity_report

    df = spark.createDataFrame([("a", 1)], ["seg", "nat"])
    with pytest.raises(ValueError):
        k_anonymity_report(df, [], k=5)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["seg"], k=1)


def test_k_anonymity_duckdb_twin(spark):
    import duckdb

    from scholarmind_spark.operators.audit import (
        k_anonymity_report,
        k_anonymity_report_sql,
    )

    rows = [("s" + str(i % 4), i % 3, i) for i in range(29)]
    df = spark.createDataFrame(rows, ["seg", "nat", "extra"])
    srows = [
        tuple(r) for r in k_anonymity_report(df, ["seg", "nat"], k=3).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (seg VARCHAR, nat INT, extra INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    orows = [
        tuple(r)
        for r in con.execute(
            k_anonymity_report_sql("t", ["seg", "nat"], k=3)
        ).fetchall()
    ]
    assert srows == orows


# ------------------------------------------------------- contract check

def test_contract_check_counts_and_null_semantics(spark):
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.audit import contract_check

    rows = [(1, 10.0), (2, None), (3, 200.0), (4, 50.0)]
    df = spark.createDataFrame(rows, ["id", "val"])
    out = {
        r["rule"]: (r["n_violations"], r["violation_pct"])
        for r in contract_check(
            df,
            [
                ("val_le_100", F.col("val") <= 100),  # NULL counts
                ("val_null_ok", F.col("val").isNull() | (F.col("val") <= 100)),
                ("id_positive", F.col("id") > 0),
            ],
        ).collect()
    }
    assert out["val_le_100"] == (2, 50.0)   # 200 AND the NULL
    assert out["val_null_ok"] == (1, 25.0)  # explicit exemption
    assert out["id_positive"] == (0, 0.0)


def test_contract_check_duckdb_twin(spark):
    import duckdb

    from pyspark.sql import functions as F

    from scholarmind_spark.operators.audit import (
        contract_check,
        contract_check_sql,
    )

    rows = [(i, float(i % 7)) for i in range(50)] + [(99, None)]
    df = spark.createDataFrame(rows, ["id", "val"])
    srows = [
        tuple(r)
        for r in contract_check(
            df, [("val_lt_5", F.col("val") < 5), ("id_lt_40", F.col("id") < 40)]
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, val DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    orows = con.execute(
        contract_check_sql("t", [("val_lt_5", "val < 5"), ("id_lt_40", "id < 40")])
    ).fetchall()
    assert srows == orows


def test_contract_check_requires_rules(spark):
    import pytest

    from scholarmind_spark.operators.audit import (
        contract_check,
        contract_check_sql,
    )

    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        contract_check(df, [])
    with pytest.raises(ValueError):
        contract_check_sql("t", [])


def test_contract_check_empty_input_and_quoted_names(spark):
    import duckdb

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from scholarmind_spark.operators.audit import (
        contract_check,
        contract_check_sql,
    )

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("id", T.LongType())])
    )
    row = contract_check(empty, [("it's positive", F.col("id") > 0)]).collect()[0]
    assert (row["rule"], row["n_rows"], row["n_violations"], row["violation_pct"]) == (
        "it's positive", 0, 0, 0.0
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT)")
    orow = con.execute(
        contract_check_sql("t", [("it's positive", "id > 0")])
    ).fetchone()
    assert orow == ("it's positive", 0, 0, 0.0)
