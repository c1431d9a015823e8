"""Distributed k-means: inertia decreases, clusters are recovered, and the
trained codebook assigns every vector to its true blob."""

from __future__ import annotations

from scholarmind_spark.operators.kmeans import kmeans_fit, kmeans_predict

# three well-separated 4-d blobs, 4 points each (deterministic offsets)
BLOBS = {0: [0.0, 0.0, 0.0, 0.0], 1: [10.0, 10.0, 0.0, 0.0], 2: [0.0, 0.0, 10.0, 10.0]}


def _corpus(spark):
    rows = []
    vid = 0
    for b, center in BLOBS.items():
        for j in range(4):
            eps = 0.1 * (j + 1)
            rows.append((vid, [c + eps * ((i % 2) * 2 - 1) for i, c in enumerate(center)], b))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, blob int")


def test_inertia_monotone_and_blobs_recovered(spark):
    df = _corpus(spark)
    cents, inertia = kmeans_fit(df, k=3, iters=6)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:])), inertia
    assert inertia[-1] < inertia[0]

    pred = kmeans_predict(df, cents)
    got = {r.vec_id: r.cell for r in pred.collect()}
    truth = {r.vec_id: r.blob for r in df.collect()}
    # cells are arbitrary labels: require them to PARTITION exactly like blobs
    mapping = {}
    for vid, cell in got.items():
        mapping.setdefault(cell, set()).add(truth[vid])
    assert all(len(blobs) == 1 for blobs in mapping.values()), mapping
    assert len(mapping) == 3


def test_empty_cell_keeps_previous_centroid(spark):
    # k larger than distinct points: some cells get no members; fit must
    # not lose centroids (union keeps the stale ones)
    df = _corpus(spark).limit(4)
    cents, _ = kmeans_fit(df, k=3, iters=2)
    assert cents.count() == 3


def test_trained_codebook_drives_ivf(spark):
    """End-to-end: kmeans_fit centroids plug into ivf_topk and produce a
    full top-k per query on the real embeddings table."""
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.similarity import ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, inertia = kmeans_fit(e, k=8, iters=3)
    assert inertia[-1] <= inertia[0]
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(e, q, k=5, centroids_df=cents).collect()
    assert len(out) == 15
    assert all(-1.0 <= r.cosine <= 1.0 for r in out)


def test_seeding_has_no_single_partition_exchange(spark):
    """The seed selection must compile to a distributed top-k
    (TakeOrderedAndProject), not a global row_number() window that sorts
    the corpus in ONE task."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 7)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    seeded = (
        df.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
        .limit(4)
    )
    plan = seeded._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    # and the full fit still recovers blob structure deterministically
    from scholarmind_spark.operators.kmeans import kmeans_fit

    c1, _ = kmeans_fit(df, k=4, iters=2)
    c2, _ = kmeans_fit(df, k=4, iters=2)
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))
