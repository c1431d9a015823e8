from __future__ import annotations

import duckdb

from scholarmind_spark.operators.overlap import vocab_overlap, vocab_overlap_sql


def test_known_overlap_counts(spark):
    df = spark.createDataFrame(
        [
            ("s1", "a b c"),
            ("s1", "c d"),          # V(s1) = {a,b,c,d}
            ("s2", "c d e"),        # V(s2) = {c,d,e}
            ("s3", "x y"),          # disjoint
        ],
        ["source", "text"],
    )
    got = {(r["a"], r["b"]): r.asDict() for r in vocab_overlap(df).collect()}
    assert got[("s1", "s2")]["n_inter"] == 2
    assert got[("s1", "s2")]["n_union"] == 5
    assert got[("s1", "s3")]["n_inter"] == 0
    assert got[("s1", "s3")]["n_union"] == 6
    assert got[("s2", "s3")]["n_inter"] == 0
    assert len(got) == 3


def test_case_and_duplicates_collapse(spark):
    df = spark.createDataFrame(
        [("s1", "Cat CAT cat"), ("s2", "cat")], ["source", "text"]
    )
    r = vocab_overlap(df).collect()[0]
    assert (r["n_a"], r["n_b"], r["n_inter"], r["n_union"]) == (1, 1, 1, 1)


def test_matches_duckdb_twin(spark, tmp_path):
    rows = [
        (f"s{i % 4}", " ".join(f"w{(i * j) % 13}" for j in range(6)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in vocab_overlap(df).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(vocab_overlap_sql("docs")).fetchall())
    assert got == want and len(got) == 6
