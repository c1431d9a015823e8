"""ANN recall characterization: measure LSH and IVF top-k recall against
the exact cosine baseline at a given scale factor.

Approximate indexes trade recall for the bucket-join plan shape that
survives 100 TB; this tool quantifies the trade so the choice is a number,
not a vibe.  Recall@k = |approx ∩ exact| / k averaged over the query set.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries] [replicate]
Appends a section to SCALE.md.

``replicate`` > 1 scales the corpus: replica i is every vector with its
dimensions cyclically rotated by i (a rotation of an isotropic Gaussian
is another isotropic Gaussian, ~uncorrelated with the original), so a
10x corpus keeps the distribution while growing the index 10x — the
round-11 ask: recall evidence at the scale the 100 TB posture claims.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    replicate = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    from functools import reduce

    from pyspark.sql import functions as F

    from scholarmind_spark import get_spark
    from scholarmind_spark.operators.kmeans import kmeans_fit
    from scholarmind_spark.operators.similarity import ann_lsh_topk, cosine_topk, ivf_topk

    spark = get_spark(app_name="ann-recall")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(e.select("embedding").first()[0])
    if replicate > 1:
        copies = []
        for i in range(replicate):
            r = i % dim
            rot = (
                F.col("embedding")
                if r == 0
                else F.expr(
                    f"concat(slice(embedding, {r + 1}, {dim - r}),"
                    f" slice(embedding, 1, {r}))"
                )
            )
            copies.append(
                e.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                    rot.alias("embedding"),
                )
            )
        e = reduce(lambda a, b: a.unionByName(b), copies)
    e = e.persist()
    n_corpus = e.count()
    print(f"corpus: {n_corpus} vectors (replicate={replicate})")
    q = e.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def topk_sets(df):
        rows = df.collect()
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    exact = topk_sets(cosine_topk(e, q, k=k))
    trained, inertia = kmeans_fit(e, k=16, iters=5)
    trained.persist().count()
    print(f"kmeans-16 inertia: {inertia[0]:.0f} -> {inertia[-1]:.0f}")
    trained64, inertia64 = kmeans_fit(e, k=64, iters=5)
    trained64.persist().count()
    print(f"kmeans-64 inertia: {inertia64[0]:.0f} -> {inertia64[-1]:.0f}")
    results = {}
    for name, fn in [
        ("lsh", ann_lsh_topk),
        ("ivf_nprobe1", lambda d, qq, k: ivf_topk(d, qq, k=k, nprobe=1)),
        ("ivf", ivf_topk),
        ("ivf_nprobe4", lambda d, qq, k: ivf_topk(d, qq, k=k, nprobe=4)),
        ("ivf_nprobe8", lambda d, qq, k: ivf_topk(d, qq, k=k, nprobe=8)),
        ("ivf_kmeans", lambda d, qq, k: ivf_topk(d, qq, k=k, centroids_df=trained)),
        ("ivf_kmeans_nprobe4", lambda d, qq, k: ivf_topk(d, qq, k=k, nprobe=4, centroids_df=trained)),
        ("ivf_kmeans_nprobe8", lambda d, qq, k: ivf_topk(d, qq, k=k, nprobe=8, centroids_df=trained)),
        ("ivf_kmeans64_nprobe8", lambda d, qq, k: ivf_topk(d, qq, k=k, nprobe=8, centroids_df=trained64)),
        ("ivf_kmeans64_nprobe16", lambda d, qq, k: ivf_topk(d, qq, k=k, nprobe=16, centroids_df=trained64)),
        ("ivf_kmeans64_nprobe32", lambda d, qq, k: ivf_topk(d, qq, k=k, nprobe=32, centroids_df=trained64)),
    ]:
        approx = topk_sets(fn(e, q, k=k))
        recalls = [
            len(approx.get(qid, set()) & hits) / len(hits) for qid, hits in exact.items()
        ]
        results[name] = sum(recalls) / len(recalls)
        print(f"{name}: recall@{k} = {results[name]:.3f} over {len(recalls)} queries")

    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    with open(out_md, "a") as f:
        f.write(
            f"\n\n## ANN recall@{k} vs exact cosine ({sf_dir}, {nq} queries, "
            f"{n_corpus} vectors, replicate={replicate})\n\n"
            "| index | recall |\n|---|---|\n"
            + "".join(f"| {n} | {r:.3f} |\n" for n, r in results.items())
            + "\nLSH uses 8 tables x 6 hyperplanes (multi-table: single-table\n"
            "recall measured 0.01); IVF probes the 2 nearest cells. Both keep\n"
            "shuffle linear in corpus size — the exact baseline is quadratic\n"
            "per query set. NB the synthetic embeddings are isotropic Gaussian,\n"
            "the worst case for LSH (real embedding spaces cluster, and recall\n"
            "rises with cluster structure); the tunables trade candidates for\n"
            "recall explicitly (tables/planes, nprobe).\n"
        )
    print(f"appended to {out_md}")


if __name__ == "__main__":
    main()
