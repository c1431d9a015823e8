from __future__ import annotations

import duckdb

from scholarmind_spark.operators.centroid import centroid_classify, centroid_classify_sql


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id: bigint, embedding: array<float>, label: int")


def test_separable_clusters_classify_perfectly(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0), (3, [1.1, -0.1], 0),
        (4, [0.0, 1.0], 1), (5, [0.1, 0.9], 1), (6, [-0.1, 1.1], 1),
    ]
    out = centroid_classify(_df(spark, rows)).collect()
    assert all(r["correct"] for r in out) and len(out) == 6


def test_label_noise_is_flagged(spark):
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.1], 0), (3, [0.95, 0.0], 0),
        (4, [0.0, 1.0], 1), (5, [0.1, 1.0], 1),
        (9, [1.0, 0.05], 1),  # mislabeled: sits in cluster 0
    ]
    got = {r["vec_id"]: r for r in centroid_classify(_df(spark, rows)).collect()}
    assert got[9]["pred_label"] == 0 and not got[9]["correct"]
    assert got[1]["correct"]


def test_tie_breaks_to_smaller_label(spark):
    # two identical one-vector classes: every vector is equidistant
    rows = [(1, [1.0, 1.0], 7), (2, [1.0, 1.0], 3)]
    got = {r["vec_id"]: r["pred_label"] for r in centroid_classify(_df(spark, rows)).collect()}
    assert got[1] == 3 and got[2] == 3


def test_matches_duckdb_twin(spark, tmp_path):
    rows = [
        (i, [((i * 37 + j * 11) % 19 - 9) / 10.0 for j in range(8)], i % 3)
        for i in range(30)
    ]
    df = _df(spark, rows)
    p = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(p)
    got = {
        (r["vec_id"], r["label"], r["pred_label"], r["correct"])
        for r in centroid_classify(df).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW emb AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(centroid_classify_sql("emb")).fetchall())
    assert got == want
