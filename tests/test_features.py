"""Feature-hashing featurizer (operators/features)."""

from __future__ import annotations

import math

from scholarmind_spark.operators.features import hash_features


def test_hash_features_l2_normalized_and_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "delta delta")],
        "doc_id long, text string",
    )
    rows = hash_features(df, dim=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # per-doc L2 norm of values ~ 1 (rounded components)
    for doc, rs in by_doc.items():
        norm = math.sqrt(sum(r.value**2 for r in rs))
        assert abs(norm - 1.0) < 1e-4, (doc, norm)
    # tf magnitudes: doc 2 is one token twice -> single bucket, |tf|=2, |value|=1
    assert len(by_doc[2]) == 1
    assert abs(by_doc[2][0].tf_signed) == 2
    assert abs(by_doc[2][0].value) == 1.0
    # determinism
    again = hash_features(df, dim=16).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hash_features_same_token_same_bucket_across_docs(spark):
    df = spark.createDataFrame(
        [(1, "shared unique1"), (2, "shared unique2")], "doc_id long, text string"
    )
    rows = hash_features(df, dim=8).collect()
    # the shared token lands in the same (bucket, sign) for both docs
    # (find buckets present in both docs with equal signed direction)
    d1 = {(r.bucket, r.tf_signed > 0) for r in rows if r.doc_id == 1}
    d2 = {(r.bucket, r.tf_signed > 0) for r in rows if r.doc_id == 2}
    assert d1 & d2
