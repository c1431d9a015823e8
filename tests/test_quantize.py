from __future__ import annotations

import duckdb

from scholarmind_spark.operators.quantize import (
    quantize_embeddings,
    quantize_embeddings_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id: bigint, embedding: array<float>")


def test_codes_and_scale(spark):
    rows = [(1, [1.0, -0.5, 0.25, 0.0])]
    r = quantize_embeddings(_df(spark, rows)).collect()[0]
    assert r["scale_micro"] == 1_000_000
    assert list(r["q"]) == [127, -64, 32, 0]  # round-half-away: 31.75->32, 63.5->64


def test_zero_vector_is_safe(spark):
    r = quantize_embeddings(_df(spark, [(1, [0.0, 0.0])])).collect()[0]
    assert r["scale_micro"] == 1 and list(r["q"]) == [0, 0]


def test_codes_bounded_and_reconstruction_close(spark):
    rows = [(i, [((i * 13 + j * 7) % 41 - 20) / 20.0 for j in range(16)])
            for i in range(20)]
    out = quantize_embeddings(_df(spark, rows)).collect()
    by_id = {r["vec_id"]: r for r in out}
    for vid, vec in rows:
        r = by_id[vid]
        assert all(-127 <= c <= 127 for c in r["q"])
        for v, c in zip(vec, r["q"]):
            recon = c * r["scale_micro"] / (127 * 1_000_000)
            assert abs(recon - v) <= r["scale_micro"] / (127 * 1e6) * 0.51 + 1e-6


def test_matches_duckdb_twin(spark, tmp_path):
    rows = [(i, [((i * 31 + j * 11) % 23 - 11) / 9.0 for j in range(8)])
            for i in range(30)]
    df = _df(spark, rows)
    p = str(tmp_path / "e.parquet")
    df.coalesce(1).write.parquet(p)
    got = {
        (r["vec_id"], r["scale_micro"], tuple(r["q"]))
        for r in quantize_embeddings(df).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW e AS SELECT * FROM '{p}/*.parquet'")
    want = {
        (vid, s, tuple(q))
        for vid, s, q in con.sql(quantize_embeddings_sql("e")).fetchall()
    }
    assert got == want
