"""Empirical scaling probe: run the heaviest operators at 1x/2x/5x/10x of
the sf0.1 corpus and record how wall-clock grows with input size.

The 100 TB design claims in README/PLANS are plan-shape arguments; this
probe adds measured evidence: near-linear growth (time-ratio ≈ size-ratio)
means no hidden quadratic blowup at least across one decade of scale.

Replication detail: each extra copy gets its texts `translate`'d with a
rotated consonant mapping, so shingles across copies do NOT collide —
otherwise every copy would near-dup-match every other copy and pair counts
would grow quadratically BY CONSTRUCTION, which would measure the data, not
the algorithm.  doc_ids are offset per copy to stay unique.

Usage: python tools/scale_probe.py [sf_dir] [out_md]   (defaults sf0.1, SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Full alphabet: rotations are distinct for every copy up to k=26.  The
# previous 11-letter frequent-letter alphabet made copy i and copy i+11
# IDENTICAL up to doc_id — at k=20 nine copy-pairs near-dup-matched by
# construction and the 20x endpoint measured the data, not the algorithm
# (the exact failure mode this replicator exists to avoid).
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def replicated_docs(spark, sf_dir: str, k: int):
    from functools import reduce

    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = []
    for i in range(k):
        rot = ALPHA[i % len(ALPHA):] + ALPHA[: i % len(ALPHA)]
        copies.append(
            d.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                (F.translate(F.col("text"), ALPHA, rot)).alias("text"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), copies)


def probe(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.neardup import (
        minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs,
    )
    from scholarmind_spark.operators.decontam import decontamination_overlap
    from scholarmind_spark.operators.textstats import (
        token_topk, with_text_stats, word_repetition,
    )

    def t_exact(df):
        out = (
            df.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keep"), F.count("*").alias("n"))
            .filter(F.col("n") > 1)
        )
        return out.count()

    from scholarmind_spark.operators.bm25 import bm25_topk
    from scholarmind_spark.operators.boilerplate import scrub_repeated_spans
    from scholarmind_spark.operators.features import hash_features
    from scholarmind_spark.operators.graph import cooccurrence_edges, pagerank
    from scholarmind_spark.operators.linkage import fuzzy_link
    from scholarmind_spark.operators.lm import bigram_lm_score
    from scholarmind_spark.operators.packing import pack_sequences
    from scholarmind_spark.operators.textstats import char_entropy, tokens

    def t_fuzzy(df):
        # Since round 7, fuzzy_link blocks on PassJoin SEGMENT STRINGS
        # (data-dependent, high-cardinality keys) instead of fixed
        # (char, len) buckets, so the rotated-replica vocabulary no
        # longer collapses into a constant block count — candidate
        # volume tracks segment-string frequency, near-linear here too.
        vocab = df.select(
            F.explode(F.transform(tokens(F.col("text")), F.lower)).alias("w")
        )
        return fuzzy_link(vocab, "w", max_dist=2).count()

    from scholarmind_spark.operators.lm import collocations
    from scholarmind_spark.operators.neardup import (
        containment_pairs,
        ngram_jaccard_against,
    )
    from scholarmind_spark.operators.pii import redact_pii, with_pii_counts

    def t_incremental(df):
        # odd ids play the incoming batch, even the standing corpus — the
        # per-batch ingest shape; candidate volume must track corpus size
        return ngram_jaccard_against(
            df.filter(F.col("doc_id") % 2 == 1),
            df.filter(F.col("doc_id") % 2 == 0),
            threshold=0.6,
        ).count()

    def t_pii(df):
        out = redact_pii(with_pii_counts(df, "text"), "text")
        return out.agg(F.sum("n_pii"), F.sum(F.length("text"))).collect() and 0

    ops = {
        "pagerank_6it": lambda df: pagerank(
            cooccurrence_edges(df), iterations=6
        ).count(),
        "bigram_lm_score": lambda df: bigram_lm_score(df).count(),
        "collocations": lambda df: collocations(df, min_count=5, k=20).count(),
        "containment": lambda df: containment_pairs(df, tau_permille=800).count(),
        "fuzzy_link_vocab": t_fuzzy,
        "exact_dedup_hash": t_exact,
        "pack_sequences": lambda df: pack_sequences(
            df, context_tokens=512, shards=8
        ).count(),
        "scrub_spans": lambda df: scrub_repeated_spans(
            df, span_words=5, min_docs=2
        ).count(),
        "char_entropy": lambda df: char_entropy(df).count(),
        "hash_features": lambda df: hash_features(df).count(),
        "bm25_topk": lambda df: bm25_topk(
            df, ["spark", "join", "window", "stream"], k=15
        ).count(),
        "ngram_jaccard": lambda df: ngram_jaccard_pairs(df, threshold=0.6).count(),
        "minhash_lsh": lambda df: minhash_lsh_pairs(df, threshold=0.6).count(),
        "simhash": lambda df: simhash_pairs(df, max_distance=3).count(),
        "text_stats": lambda df: with_text_stats(df).agg(
            F.sum("n_tokens"), F.avg("quality_score")
        ).collect() and 0,
        "token_topk": lambda df: token_topk(df, k=20).count(),
        "word_repetition": lambda df: word_repetition(df).count(),
        # fixed-size benchmark side: growth must come from the corpus scan
        "decontam": lambda df: decontamination_overlap(
            df, df.filter(F.col("doc_id") < 50), k=3, min_overlap=2
        ).count(),
        "ngram_incremental": t_incremental,
        "pii_scan_redact": t_pii,
    }

    results: dict[str, dict[int, float]] = {name: {} for name in ops}
    # warmup: run every op once on a tiny slice, untimed — otherwise the
    # FIRST op's k=1 cell absorbs session/codegen warmup, deflating its
    # x10/x1 ratio (SCALE.md previously showed pagerank 6.9s@1x vs
    # 2.8s@10x purely from this)
    tiny = replicated_docs(spark, sf_dir, 1).limit(200).persist()
    tiny.count()
    for fn in ops.values():
        try:
            fn(tiny)
        except Exception:
            pass  # warmup only; the timed run surfaces real failures
    tiny.unpersist()
    spark.catalog.clearCache()
    for k in (1, 2, 5, 10):
        df = replicated_docs(spark, sf_dir, k).persist()
        n = df.count()  # materialize input outside the timed window
        for name, fn in ops.items():
            t0 = time.time()
            fn(df)
            results[name][k] = time.time() - t0
            spark.catalog.clearCache()
            df.persist()
            df.count()
        df.unpersist()
        print(f"k={k} rows={n} " + " ".join(f"{m}={results[m][k]:.1f}s" for m in ops))
    return results


def replicated_embeddings(spark, sf_dir: str, k: int):
    """k copies of the embeddings table; each copy's vectors get a
    copy-specific deterministic sign pattern so cross-copy cosines differ
    (otherwise every copy would near-dup-match its twins by construction
    and pair counts would grow quadratically from the DATA)."""
    from functools import reduce

    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def _flip(copy: int):
        # closure factory: F.transform dispatches on lambda ARITY, so the
        # copy index must be captured, not passed as a default arg.
        # Pattern ((j+1)·(copy+1)) % 31 < 13: DISTINCT sign masks for all
        # copies up to k=30 — the old (j+copy) % 3 had period 3 in the
        # copy index, so copies i and i+3 were bit-identical and the
        # probe partially measured constructed duplicates, not the
        # algorithm (the artifact this replicator exists to avoid)
        return lambda x, j: x * F.when(
            ((j + 1) * F.lit(copy + 1)) % 31 < 13, F.lit(-1.0)
        ).otherwise(F.lit(1.0))

    copies = []
    for i in range(k):
        copies.append(
            e.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.transform("embedding", _flip(i)).alias("embedding"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), copies)


def probe_embeddings(spark, sf_dir: str):
    from scholarmind_spark.operators.similarity import embedding_neardup_pairs
    from scholarmind_spark.util import release_caches

    results: dict[int, float] = {}
    tiny = replicated_embeddings(spark, sf_dir, 1).limit(200).persist()
    tiny.count()
    try:
        embedding_neardup_pairs(tiny, threshold=0.25).count()
    except Exception:
        pass
    tiny.unpersist()
    spark.catalog.clearCache()
    for k in (1, 2, 5, 10):
        df = replicated_embeddings(spark, sf_dir, k).persist()
        df.count()
        t0 = time.time()
        out = embedding_neardup_pairs(df, threshold=0.25)
        out.count()
        results[k] = time.time() - t0
        release_caches(out)
        spark.catalog.clearCache()
        df.unpersist()
        print(f"embedding_cosine k={k}: {results[k]:.1f}s")
    return {"embedding_cosine": results}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"
    )
    from scholarmind_spark import get_spark

    spark = get_spark(app_name="scale-probe")
    results = probe(spark, sf_dir)
    results.update(probe_embeddings(spark, sf_dir))

    lines = [
        "# SCALE — empirical scaling probe",
        "",
        f"Generated by `tools/scale_probe.py` at `{sf_dir}` on local[32].",
        "Corpus replicated 1x/2x/5x/10x with per-copy character rotation so",
        "copies do not near-dup-match each other (see the tool docstring).",
        "`xN/x1` is the time ratio — for a scalable operator it should track",
        "the size ratio (linear) rather than its square.",
        "",
        "| operator | 1x | 2x | 5x | 10x | x10/x1 |",
        "|---|---|---|---|---|---|",
    ]
    for name, by_k in results.items():
        ratio = by_k[10] / by_k[1] if by_k[1] > 0 else float("nan")
        lines.append(
            f"| {name} | {by_k[1]:.1f}s | {by_k[2]:.1f}s | {by_k[5]:.1f}s "
            f"| {by_k[10]:.1f}s | {ratio:.1f} |"
        )
    lines.append("")
    # preserve sections other tools append after the probe table (ANN recall)
    tail = ""
    if os.path.exists(out_md):
        prev = open(out_md).read()
        idx = prev.find("\n## ")
        if idx != -1:
            tail = "\n" + prev[idx + 1:]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + tail)
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
