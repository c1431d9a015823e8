"""Self-scaling LSH bucket space for embedding near-dup (derive_planes)."""

from __future__ import annotations

from scholarmind_spark.operators.similarity import (
    LSH_PLANES,
    derive_planes,
    embedding_neardup_pairs,
)
from scholarmind_spark.util import release_caches

SF001 = "/root/testdata/sf0.001"


def test_derive_planes_floor_and_growth():
    # small corpora stay at the default bucket space
    assert derive_planes(100) == LSH_PLANES
    assert derive_planes(2_000) == LSH_PLANES
    # past the floor, planes grow with log2(n / target_bucket_rows):
    # expected bucket size n/2^b stays ~target, so candidate volume
    # (n/2^b)*n stays linear in n
    assert derive_planes(16_000) == 9
    assert derive_planes(1_600_000) == 16
    # ~10 more planes per 1000x corpus growth
    assert derive_planes(1_600_000_000) == 26


def test_derive_planes_monotone():
    prev = 0
    for n in (10, 1_000, 10_000, 100_000, 10_000_000, 10_000_000_000):
        b = derive_planes(n)
        assert b >= prev
        prev = b


def test_neardup_default_planes_matches_explicit_derivation(spark):
    """planes=None must behave exactly like passing derive_planes(n)
    explicitly — the plumbing (approx_count_distinct probe → plane count)
    adds no nondeterminism."""
    e = spark.read.parquet(f"{SF001}/embeddings.parquet")
    n = e.count()
    auto = embedding_neardup_pairs(e, threshold=0.25)
    rows_auto = {(r.id_a, r.id_b, r.cosine) for r in auto.collect()}
    release_caches(auto)
    explicit = embedding_neardup_pairs(e, threshold=0.25, planes=derive_planes(n))
    rows_explicit = {(r.id_a, r.id_b, r.cosine) for r in explicit.collect()}
    release_caches(explicit)
    assert rows_auto == rows_explicit
    assert len(rows_auto) > 0


def test_zero_norm_vectors_never_rank(spark):
    """A zero vector has no direction: its cosine is 0/0 = NaN, and NaN
    sorts GREATEST in Spark — without the norm guard it would be every
    query's #1 neighbor (r6 review finding)."""
    from scholarmind_spark.operators.similarity import cosine_topk

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0]), (4, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 1").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    got = cosine_topk(df, q, k=3).collect()
    neighbors = [r["neighbor_id"] for r in got]
    assert 3 not in neighbors  # zero vector excluded entirely
    assert neighbors[0] == 2  # real nearest ranks first
    assert all(r["cosine"] == r["cosine"] for r in got)  # no NaN emitted


def test_sql_twins_reject_empty_query_ids():
    import pytest

    from scholarmind_spark.operators.similarity import (
        ann_lsh_topk_sql,
        cosine_topk_sql,
        ivf_topk_sql,
    )

    for fn in (cosine_topk_sql, ann_lsh_topk_sql, ivf_topk_sql):
        with pytest.raises(ValueError, match="non-empty"):
            fn(query_ids=[])
        with pytest.raises(ValueError, match="non-empty"):
            fn()
