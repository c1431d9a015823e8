"""ANN recall characterization: measure LSH and IVF top-k recall against
the exact cosine baseline at a given scale factor.

Approximate indexes trade recall for the bucket-join plan shape that
survives 100 TB; this tool quantifies the trade so the choice is a number,
not a vibe.  Recall@k = |approx ∩ exact| / k averaged over the query set.

Usage: python tools/ann_recall.py [sf_dir] [k] [n_queries] [replicate]
   or: python tools/ann_recall.py clustered [k] [n_queries] [n_vectors]
Appends a section to SCALE.md.

``clustered`` mode (round-12 ask): the isotropic-Gaussian rows below
are the deliberate WORST CASE for any partition-pruning index — real
embedding spaces cluster.  This mode substantiates the "on clustered
data the same recall arrives at a far smaller scan fraction" claim
with a measurement: a deterministic mixture of 16 Gaussians (seed 0,
centers N(0, I_64), two separations — tight sigma 0.3 and loose
sigma 0.7) run through the SAME kmeans-16 IVF at nprobe 1/2/4/8, with
the actual scan fraction (probed-cell sizes / corpus) reported next
to each recall so cost and quality land in one row.

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


def clustered_main():
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    n_vec = int(sys.argv[4]) if len(sys.argv) > 4 else 20_000
    n_clusters, dim = 16, 64

    import numpy as np
    from pyspark.sql import functions as F

    from scholarmind_spark import get_spark
    from scholarmind_spark.operators.kmeans import kmeans_fit
    from scholarmind_spark.operators.similarity import (
        _dot,
        _norm,
        ann_lsh_topk,
        cosine_topk,
        ivf_topk,
    )

    spark = get_spark(app_name="ann-recall-clustered")
    out_rows = []
    for sigma in (0.3, 0.7):
        rng = np.random.default_rng(0)
        centers = rng.standard_normal((n_clusters, dim))
        labels = rng.integers(0, n_clusters, n_vec)
        pts = centers[labels] + sigma * rng.standard_normal((n_vec, dim))
        e = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(n_vec)],
            "vec_id bigint, embedding array<double>",
        ).persist()
        e.count()
        q = e.filter(F.col("vec_id") < nq).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

        def topk_sets(df):
            out: dict[int, set] = {}
            for r in df.collect():
                out.setdefault(r.query_id, set()).add(r.neighbor_id)
            return out

        exact = topk_sets(cosine_topk(e, q, k=k))
        trained, inertia = kmeans_fit(e, k=n_clusters, iters=5)
        trained.persist().count()
        print(f"sigma={sigma}: kmeans-16 inertia {inertia[0]:.0f} -> {inertia[-1]:.0f}")

        # cosine cell assignment (the ivf_topk rule) for scan fractions
        cents = F.broadcast(
            trained.select("cid", "cvec", _norm(F.col("cvec")).alias("nc"))
        )
        def cos_cells(side, sid, svec, n):
            scored = side.crossJoin(cents).select(
                F.col(sid),
                F.col("cid"),
                (
                    _dot(F.col(svec), F.col("cvec"))
                    / (_norm(F.col(svec)) * F.col("nc"))
                ).alias("ccos"),
            )
            from pyspark.sql import Window

            w = Window.partitionBy(sid).orderBy(F.desc("ccos"), F.desc("cid"))
            return (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= n)
                .select(sid, "cid")
            )

        sizes = {
            r.cid: r.n
            for r in cos_cells(e, "vec_id", "embedding", 1)
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for nprobe in (1, 2, 4, 8):
            approx = topk_sets(
                ivf_topk(e, q, k=k, nprobe=nprobe, centroids_df=trained)
            )
            recalls = [
                len(approx.get(qid, set()) & hits) / len(hits)
                for qid, hits in exact.items()
            ]
            rec = sum(recalls) / len(recalls)
            probed = cos_cells(q, "query_id", "query_vec", nprobe).collect()
            per_q: dict[int, int] = {}
            for r in probed:
                per_q[r.query_id] = per_q.get(r.query_id, 0) + sizes.get(r.cid, 0)
            frac = sum(per_q.values()) / (len(per_q) * n_vec)
            out_rows.append((sigma, f"ivf_kmeans16_nprobe{nprobe}", rec, frac))
            print(
                f"sigma={sigma} nprobe={nprobe}: recall@{k}={rec:.3f} "
                f"scan={frac:.3f}"
            )
        lsh = topk_sets(ann_lsh_topk(e, q, k=k))
        recalls = [
            len(lsh.get(qid, set()) & hits) / len(hits)
            for qid, hits in exact.items()
        ]
        out_rows.append(
            (sigma, "lsh_8x6", sum(recalls) / len(recalls), float("nan"))
        )
        e.unpersist()
        trained.unpersist()

    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    with open(out_md, "a") as f:
        f.write(
            f"\n\n## ANN recall@{k} on a CLUSTERED corpus "
            f"(mixture of 16 Gaussians, {n_vec} vectors, dim 64, seed 0, "
            f"{nq} queries)\n\n"
            "| sigma | index | recall | scan fraction |\n|---|---|---|---|\n"
            + "".join(
                f"| {s} | {n} | {r:.3f} | "
                + ("—" if fr != fr else f"{fr:.3f}")
                + " |\n"
                for s, n, r, fr in out_rows
            )
        )
    print(f"appended to {out_md}")




def pq_main():
    """PQ/ADC recall vs the exact squared-L2 scan (the metric PQ ranks
    by — cosine would confound the quantizer with the metric change),
    across codebook sizes and subspace counts, with the compression
    ratio in the same row.  Usage: python tools/ann_recall.py pq
    [sf_dir] [k] [n_queries]."""
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    nq = int(sys.argv[4]) if len(sys.argv) > 4 else 20

    import numpy as np
    from pyspark.sql import functions as F

    from scholarmind_spark import get_spark
    from scholarmind_spark.operators.pq import pq_topk

    spark = get_spark(app_name="pq-recall")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(e.select("embedding").first()[0])
    n_corpus = e.count()
    rows = e.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    qids = sorted(ids)[:nq]
    # exact squared-L2 top-k (numpy — the ground truth for a probe)
    exact = {}
    for qid in qids:
        qv = V[ids == qid][0]
        d2 = ((V - qv) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        top = [int(ids[i]) for i in order if ids[i] != qid][:k]
        exact[qid] = set(top)

    q = e.filter(F.col("vec_id").isin([int(x) for x in qids])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    from scholarmind_spark.operators.pq import pq_train

    trained = {}
    results = {}
    for name, m, ncodes in [
        ("pq_m8_c16", 8, 16),
        ("pq_m8_c64", 8, 64),
        ("pq_m8_c256", 8, 256),
        ("pq_m16_c64", 16, 64),
        ("pq_m16_c256", 16, 256),
        ("pq_m8_c64_trained", 8, 64),
        ("pq_m16_c256_trained", 16, 256),
    ]:
        if ncodes > n_corpus:
            continue
        if name.endswith("_trained"):
            key = (m, ncodes)
            if key not in trained:
                trained[key] = pq_train(e, m=m, dim=dim, codes=ncodes, iters=4)
            out = pq_topk(
                e, q, k=k, m=m, dim=dim, subspace_codebook_df=trained[key]
            )
        else:
            out = pq_topk(
                e, q, k=k, m=m, dim=dim,
                codebook_ids=[int(x) for x in sorted(ids)[:ncodes]],
            )
        approx = {}
        for r in out.collect():
            approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        rec = [
            len(approx.get(qid, set()) & hits) / len(hits)
            for qid, hits in exact.items()
        ]
        comp = dim * 4 / m  # float32 corpus bytes per PQ byte-ish code
        results[name] = (sum(rec) / len(rec), comp)
        print(f"{name}: recall@{k} = {results[name][0]:.3f} "
              f"(compression {comp:.0f}x vs float32)")

    # the composed index: IVF routing (kmeans-16 coarse) x PQ codes,
    # raw-encoding vs the paper's residual encoding, same code budget
    from scholarmind_spark.operators.kmeans import kmeans_fit
    from scholarmind_spark.operators.pq import (
        ivfadc_topk,
        pq_train_residual,
    )

    coarse, _ = kmeans_fit(e, k=16, iters=4)
    coarse.persist().count()
    res_cb = pq_train_residual(e, coarse, m=8, dim=dim, codes=64, iters=4)
    raw_cb = trained.get((8, 64)) or pq_train(e, m=8, dim=dim, codes=64, iters=4)
    for name, cb, byres in [
        ("ivfadc_m8_c64_raw_nprobe4", raw_cb, False),
        ("ivfadc_m8_c64_residual_nprobe4", res_cb, True),
    ]:
        out = ivfadc_topk(
            e, q, k=k, m=8, dim=dim, nprobe=4, coarse_df=coarse,
            subspace_codebook_df=cb, by_residual=byres,
        )
        approx = {}
        for r in out.collect():
            approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        rec = [
            len(approx.get(qid, set()) & hits) / len(hits)
            for qid, hits in exact.items()
        ]
        results[name] = (sum(rec) / len(rec), dim * 4 / 8)
        print(f"{name}: recall@{k} = {results[name][0]:.3f}")

    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    with open(out_md, "a") as f:
        f.write(
            f"\n\n## PQ/ADC recall@{k} vs exact squared-L2 ({sf_dir}, "
            f"{nq} queries, {n_corpus} vectors, corpus-subset codebooks)\n\n"
            "| config | recall | compression vs float32 |\n|---|---|---|\n"
            + "".join(
                f"| {n} | {r:.3f} | {c:.0f}x |\n"
                for n, (r, c) in results.items()
            )
            + "\nCorpus-subset codebooks (no k-means training) are the\n"
            "recall FLOOR: trained per-subspace codebooks only improve the\n"
            "quantizer.  Isotropic-Gaussian embeddings are additionally the\n"
            "hardest case (no cluster structure for codewords to exploit).\n"
            "The trade on display: bytes/vector shrink by the compression\n"
            "column while the scan stays full-corpus — compose with IVF\n"
            "(probe cells, ADC within) for the paper's IVFADC shape.\n"
        )
    print(f"appended to {out_md}")
    spark.stop()


def ivfadc_clustered_main():
    """IVFADC recall in the CLUSTERED regime (r13 verdict ask #4 — the
    SCALE.md ivfadc rows were isotropic-only, the honest floor; the
    100 TB ANN story quotes the clustered regime, so measure it): the
    same 16-Gaussian mixtures (seed 0, sigma 0.3 / 0.7) as the r12 IVF
    probe study, raw vs residual encoding at m8/c64 and m16/c256,
    kmeans-trained coarse (k=16) + pq_train / pq_train_residual
    codebooks, nprobe 4.  Ground truth is the exact squared-L2 top-k
    (numpy — ADC approximates L2, so L2 is the right referee); the scan
    fraction uses the L2 cell assignment ivfadc actually routes by.

    Usage: python tools/ann_recall.py ivfadc_clustered [k] [nq] [n_vec]
    Appends a section to SCALE.md."""
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    n_vec = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000
    n_clusters, dim, nprobe = 16, 64, 4

    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from scholarmind_spark import get_spark
    from scholarmind_spark.operators.kmeans import _assign, kmeans_fit
    from scholarmind_spark.operators.pq import (
        _sq,
        ivfadc_topk,
        pq_train,
        pq_train_residual,
    )

    spark = get_spark(app_name="ivfadc-clustered")
    spark.sparkContext.setLogLevel("ERROR")
    out_rows = []
    for sigma in (0.3, 0.7):
        rng = np.random.default_rng(0)
        centers = rng.standard_normal((n_clusters, dim))
        labels = rng.integers(0, n_clusters, n_vec)
        pts = centers[labels] + sigma * rng.standard_normal((n_vec, dim))
        e = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(n_vec)],
            "vec_id bigint, embedding array<double>",
        ).persist()
        e.count()
        # exact squared-L2 ground truth (numpy)
        exact = {}
        for qid in range(nq):
            d2 = ((pts - pts[qid]) ** 2).sum(axis=1)
            order = np.lexsort((np.arange(n_vec), d2))
            exact[qid] = set([int(i) for i in order if i != qid][:k])
        q = e.filter(F.col("vec_id") < nq).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        coarse, inertia = kmeans_fit(e, k=n_clusters, iters=5)
        coarse = coarse.select("cid", "cvec").persist()
        coarse.count()
        print(
            f"sigma={sigma}: kmeans-{n_clusters} inertia "
            f"{inertia[0]:.0f} -> {inertia[-1]:.0f}"
        )
        # scan fraction under the L2 routing ivfadc uses
        sizes = {
            r.cell: r.n
            for r in _assign(e, coarse, "vec_id", "embedding")
            .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        qs = q.crossJoin(F.broadcast(coarse)).select(
            "query_id", F.col("cid").alias("cell"),
            _sq(F.col("query_vec"), F.col("cvec")).alias("cd"),
        )
        pw = Window.partitionBy("query_id").orderBy("cd", "cell")
        per_q: dict[int, int] = {}
        for r in (
            qs.withColumn("rn", F.row_number().over(pw))
            .filter(F.col("rn") <= nprobe).select("query_id", "cell").collect()
        ):
            per_q[r.query_id] = per_q.get(r.query_id, 0) + sizes.get(r.cell, 0)
        frac = sum(per_q.values()) / (len(per_q) * n_vec)

        for m, codes in ((8, 64), (16, 256)):
            raw_cb = pq_train(e, m=m, dim=dim, codes=codes, iters=3)
            res_cb = pq_train_residual(
                e, coarse, m=m, dim=dim, codes=codes, iters=3
            )
            from scholarmind_spark.operators.pq import ivfadc_refine_topk

            for enc, cb, byres in (("raw", raw_cb, False),
                                   ("residual", res_cb, True)):
                variants = [
                    (f"ivfadc_m{m}_c{codes}_{enc}_nprobe{nprobe}",
                     ivfadc_topk(
                         e, q, k=k, m=m, dim=dim, nprobe=nprobe,
                         coarse_df=coarse, subspace_codebook_df=cb,
                         by_residual=byres,
                     )),
                    # IVFADC+R: same candidates, exact re-rank of the
                    # ADC top-50 — quantization error now bounds only
                    # candidate recall (rerank x |q| exact flops extra)
                    (f"ivfadc_m{m}_c{codes}_{enc}_nprobe{nprobe}_rerank50",
                     ivfadc_refine_topk(
                         e, q, k=k, rerank=50, m=m, dim=dim,
                         nprobe=nprobe, coarse_df=coarse,
                         subspace_codebook_df=cb, by_residual=byres,
                     )),
                ]
                for name, out in variants:
                    approx: dict[int, set] = {}
                    for r in out.collect():
                        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
                    rec = sum(
                        len(approx.get(qid, set()) & hits) / len(hits)
                        for qid, hits in exact.items()
                    ) / len(exact)
                    out_rows.append((sigma, name, rec, frac))
                    print(f"sigma={sigma} {name}: recall@{k}={rec:.3f} "
                          f"scan={frac:.3f}")
        e.unpersist()
        coarse.unpersist()

    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    with open(out_md, "a") as f:
        f.write(
            f"\n\n## IVFADC recall@{k} on the CLUSTERED corpus "
            f"(mixture of 16 Gaussians, {n_vec} vectors, dim 64, seed 0, "
            f"{nq} queries, kmeans-16 coarse, trained codebooks, "
            f"nprobe {nprobe})\n\n"
            "| sigma | config | recall | scan fraction |\n|---|---|---|---|\n"
            + "".join(
                f"| {s} | {n} | {r:.3f} | {fr:.3f} |\n"
                for s, n, r, fr in out_rows
            )
        )
    print(f"appended to {out_md}")
    spark.stop()


def state_refined_main():
    """Recall of the STATE-SERVED production recipe (r14 verdict ask
    #1's measurement half): the clustered mixtures are FOLDED into a
    residual-mode index state (compaction + standing deltas — the
    shape a production reader sees), then ann_state_query (ADC only)
    and ann_state_query_refined (ADC top-50 → exact re-rank against
    the source corpus) are scored against exact-L2 ground truth at the
    production point (residual, m16/c256, kmeans-16 coarse, nprobe 4).
    The claim under test: the streaming surface serves the SAME 0.96
    recall the batch ivfadc_refine_topk measured — the refine stage is
    now on the read path that matters, and state==batch is asserted
    row-for-row, not just recall-for-recall.

    Usage: python tools/ann_recall.py state_refined [k] [nq] [n_vec]
    Appends a section to SCALE.md."""
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    n_vec = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000
    n_clusters, dim, nprobe, m, codes, rerank = 16, 64, 4, 16, 256, 50

    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from scholarmind_spark import get_spark
    from scholarmind_spark.operators.kmeans import kmeans_fit
    from scholarmind_spark.operators.pq import (
        ivfadc_refine_topk,
        pq_train_residual,
    )
    from scholarmind_spark.streaming.pipeline import (
        _vector_ingest_fn,
        ann_state_query,
        ann_state_query_refined,
    )

    spark = get_spark(app_name="ann-state-refined")
    spark.sparkContext.setLogLevel("ERROR")
    out_rows = []
    for sigma in (0.3, 0.7):
        rng = np.random.default_rng(0)
        centers = rng.standard_normal((n_clusters, dim))
        labels = rng.integers(0, n_clusters, n_vec)
        pts = centers[labels] + sigma * rng.standard_normal((n_vec, dim))
        e = spark.createDataFrame(
            [(int(i), [float(x) for x in pts[i]]) for i in range(n_vec)],
            "vec_id bigint, embedding array<double>",
        ).persist()
        e.count()
        exact = {}
        for qid in range(nq):
            d2 = ((pts - pts[qid]) ** 2).sum(axis=1)
            order = np.lexsort((np.arange(n_vec), d2))
            exact[qid] = set([int(i) for i in order if i != qid][:k])
        q = e.filter(F.col("vec_id") < nq).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        coarse, _ = kmeans_fit(e, k=n_clusters, iters=5)
        coarse = coarse.select("cid", "cvec").persist()
        coarse.count()
        res_cb = pq_train_residual(
            e, coarse, m=m, dim=dim, codes=codes, iters=3
        ).persist()
        res_cb.count()
        # fold the corpus as a stream would: creation base, compaction
        # at fold 2 (compact_every=2), fold 3 standing as a delta — the
        # query crosses a cell-partitioned base AND a delta
        state = tempfile.mkdtemp(prefix=f"recall_state_{sigma}_")
        fold = _vector_ingest_fn(
            state, "recallstate", m=m, dim=dim, coarse_df=coarse,
            subspace_codebook_df=res_cb, compact_every=2,
            by_residual=True,
        )
        vid = F.col("vec_id")
        for i in range(3):
            fold(e.filter(vid % 3 == i), i)

        def rec_of(out):
            approx = {}
            for r in out.collect():
                approx.setdefault(r.query_id, set()).add(r.neighbor_id)
            return sum(
                len(approx.get(qid, set()) & hits) / len(hits)
                for qid, hits in exact.items()
            ) / len(exact)

        adc_df = ann_state_query(
            spark, state, q, k=k, nprobe=nprobe, m=m, dim=dim
        )
        ref_df = ann_state_query_refined(
            spark, state, q, raw_df=e, k=k, rerank=rerank,
            nprobe=nprobe, m=m, dim=dim,
        )
        batch_df = ivfadc_refine_topk(
            e, q, k=k, rerank=rerank, m=m, dim=dim, nprobe=nprobe,
            coarse_df=coarse, subspace_codebook_df=res_cb,
            by_residual=True,
        )
        got = sorted(map(tuple, ref_df.collect()))
        want = sorted(map(tuple, batch_df.collect()))
        same = got == want
        r_adc, r_ref = rec_of(adc_df), rec_of(ref_df)
        out_rows.append((sigma, r_adc, r_ref, same))
        print(
            f"sigma={sigma}: state ADC recall@{k}={r_adc:.3f}, "
            f"state refined={r_ref:.3f}, state==batch rows: {same}"
        )
        e.unpersist(); coarse.unpersist(); res_cb.unpersist()
        shutil.rmtree(state, ignore_errors=True)

    out_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    with open(out_md, "a") as f:
        f.write(
            f"\n\n## State-served IVFADC+R recall@{k} (clustered corpus, "
            f"{n_vec} vectors, residual m{m}/c{codes}, kmeans-{n_clusters} "
            f"coarse, nprobe {nprobe}, rerank {rerank}; index FOLDED as a "
            "stream: base + compaction + standing delta)\n\n"
            "| sigma | state ADC recall | state refined recall | "
            "state == batch refine (rows) |\n|---|---|---|---|\n"
            + "".join(
                f"| {s} | {a:.3f} | {r:.3f} | {sm} |\n"
                for s, a, r, sm in out_rows
            )
        )
    print(f"appended to {out_md}")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "clustered":
        clustered_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "pq":
        pq_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "ivfadc_clustered":
        ivfadc_clustered_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "state_refined":
        state_refined_main()
    else:
        main()
