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
