"""Round-15 optimization pins: the internals the optimization round
changed keep their exact semantics.

- gopher_repetition_stats' per-(doc, n) top gram is now a
  max(struct(c, glen, h)) aggregate instead of a row_number window —
  pin the (count, gram length, hash) DESC tie-break on crafted ties.
- queries._t memoizes the loaded frame per (session, dir, table) —
  pin reuse and that no persisted (cached) data backs it.
- pagerank's checkpoint cadence is configurable — pin that every-round
  and every-2-rounds produce identical integer fixed points.
- PQ codeword tables are single nested-array literals — pin encode and
  ADC against the brute-force Python computation.
- ledger_fingerprints is a pure projection (sort_array over the hashed
  shingle array) — pin it against the old explode → groupBy →
  collect_list reference, including the NULL-text-doc drop semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_gopher_top_gram_tiebreak_on_count_then_len(spark):
    from scholarmind_spark.operators.quality import gopher_repetition_stats

    # "aa bb" and "cc ddd" both occur twice; the longer joined gram
    # ("cc ddd", glen 6) must win the n=2 top slot over ("aa bb", 5)
    text = "aa bb x aa bb y cc ddd z cc ddd"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_repetition_stats(df).collect()[0]
    n_chars = len(text)
    # top2 = count(2) * glen(6) chars of "cc ddd"
    assert r.top2_micro == (2 * 6 * 1_000_000) // n_chars


def test_gopher_top_gram_single_doc_repeat(spark):
    from scholarmind_spark.operators.quality import gopher_repetition_stats

    df = spark.createDataFrame(
        [(7, "w w w w w w")], "doc_id long, text string"
    )
    r = gopher_repetition_stats(df).collect()[0]
    # five "w w" bigram positions, all the same gram (count 5, glen 3)
    assert r.top2_micro == (5 * 3 * 1_000_000) // len("w w w w w w")
    # dup thresholds need n>=5 grams with count>1: "w w w w w" twice
    assert r.dup5_micro == (2 * 9 * 1_000_000) // len("w w w w w w")


def test_t_memo_reuses_frame_and_caches_nothing(spark, tmp_path):
    from scholarmind_spark import queries as q

    p = tmp_path / "documents.parquet"
    spark.range(5).selectExpr(
        "id AS doc_id", "concat('t', id) AS text"
    ).write.parquet(str(p))
    a = q._t(spark, str(tmp_path), "documents")
    b = q._t(spark, str(tmp_path), "documents")
    assert a is b  # memo hit: same analyzed frame, no re-listing
    # the memo must never persist data: executions recompute from files
    assert not a.storageLevel.useMemory and not a.storageLevel.useDisk
    assert a.count() == 5


def test_pagerank_checkpoint_cadence_is_result_invariant(spark):
    from scholarmind_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2), (3, 1, 1), (4, 1, 3), (5, 5, 1)],
        "src long, dst long, weight long",
    )
    r1 = {
        (r.node, r.rank_micro)
        for r in pagerank(edges, iterations=5, checkpoint_every=1).collect()
    }
    r2 = {
        (r.node, r.rank_micro)
        for r in pagerank(edges, iterations=5, checkpoint_every=2).collect()
    }
    assert r1 == r2


def test_pq_literal_tables_match_bruteforce(spark):
    from scholarmind_spark.operators.pq import pq_topk

    dim, m, k = 8, 4, 3
    rows = [
        (i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(dim)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = [
        (r.query_id, r.neighbor_id, r.rank)
        for r in pq_topk(
            df, q, k=k, m=m, dim=dim, codebook_ids=[0, 1, 2, 3]
        ).orderBy("rank").collect()
    ]

    # brute-force mirror: value-sorted positional codebook, (d, pos)
    # argmin per subspace, ADC left-to-right, (adc, id) ranking
    w = dim // m
    cb = {i: v for i, v in rows if i in (0, 1, 2, 3)}
    subs = [
        [v[s * w : (s + 1) * w] for _cid, v in sorted(cb.items())]
        for s in range(m)
    ]

    def sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) ** 2
        return acc

    def encode(v):
        return [
            min(
                range(len(subs[s])),
                key=lambda c: (sq(v[s * w : (s + 1) * w], subs[s][c]), c),
            )
            for s in range(m)
        ]

    qvec = dict(rows)[0]
    scored = []
    for i, v in rows:
        if i == 0:
            continue
        code = encode(v)
        adc = 0.0
        for s in range(m):
            adc += sq(qvec[s * w : (s + 1) * w], subs[s][code[s]])
        scored.append((adc, i))
    scored.sort()
    want = [(0, nid, rk + 1) for rk, (_d, nid) in enumerate(scored[:k])]
    assert got == want


def test_ledger_fingerprints_projection_matches_regroup_reference(spark):
    from scholarmind_spark.operators.ledger import ledger_fingerprints
    from scholarmind_spark.operators.neardup import minhash_base, shingles

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),
            (2, "a b c d e"),  # exactly k tokens -> one shingle
            (3, "short"),  # < k tokens -> whole-text shingle
            (4, None),  # NULL text: must have NO ledger row
            (5, ""),  # empty text: one empty-string shingle
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: (r.n, list(r.hs)) for r in ledger_fingerprints(df).collect()
    }

    # reference: the pre-r15 explode -> groupBy -> sorted collect_list
    ref_rows = (
        df.select(
            F.col("doc_id").alias("id"),
            shingles(F.col("text")).alias("shs"),
        )
        .select("id", F.size("shs").alias("n"), F.explode("shs").alias("s"))
        .select("id", "n", minhash_base(F.col("s")).alias("sh"))
        .where(F.col("sh").isNotNull())
        .groupBy("id", "n")
        .agg(F.sort_array(F.collect_list("sh")).alias("hs"))
        .collect()
    )
    ref = {r.id: (r.n, list(r.hs)) for r in ref_rows}
    assert got == ref
    assert 4 not in got  # NULL-text doc dropped on both paths
    assert got[3][0] == 1 and len(got[3][1]) == 1


def test_cc_seeded_init_matches_reference_on_chain_star_cycle(spark):
    """connected_components seeds labels with min(node, min neighbor);
    the fixpoint must equal the identity-init reference on shapes that
    exercise multi-round convergence: a 6-chain (diameter forces
    pointer jumping), a star, a cycle, and an isolated pair."""
    from scholarmind_spark.operators.cluster import connected_components

    pairs = [
        (10, 11), (11, 12), (12, 13), (13, 14), (14, 15),  # chain
        (20, 21), (20, 22), (20, 23),                      # star
        (30, 31), (31, 32), (32, 30),                      # cycle
        (40, 41),                                          # pair
    ]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        (r.node, r.component)
        for r in connected_components(df).collect()
    }
    want = set()
    comp = {ch: 10 for ch in range(10, 16)}
    comp.update({s: 20 for s in range(20, 24)})
    comp.update({c: 30 for c in range(30, 33)})
    comp.update({p: 40 for p in (40, 41)})
    want = set(comp.items())
    assert got == want


def test_dsir_shared_features_matches_unshared(spark):
    """dataset_dsir_select now computes the raw feature pass once and
    shares it between the histogram and scoring stages; sharing must
    not change a single score or the selection."""
    from scholarmind_spark.operators.dsir import (
        dsir_bucket_logratio,
        dsir_features,
        dsir_score,
        dsir_select,
    )

    d = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox jumps"),
            (2, "en", "the lazy dog sleeps"),
            (3, "de", "der schnelle braune fuchs"),
            (4, "de", "the quick brown fox naps"),
            (5, "en", "wholly different content here"),
        ],
        "doc_id long, lang string, text string",
    )
    target = d.filter(F.col("lang") == "en")

    ratios_u = dsir_bucket_logratio(d, target)
    sel_u = dsir_select(dsir_score(d, ratios_u), 3).collect()

    feats = dsir_features(d).persist()
    ratios_s = dsir_bucket_logratio(d, target, raw_feats=feats)
    sel_s = dsir_select(dsir_score(d, ratios_s, feats=feats), 3).collect()
    feats.unpersist()

    key = lambda rows: sorted((r.doc_id, r.n_feats, r.dsir_micro, r.gkey) for r in rows)
    assert key(sel_u) == key(sel_s)


def test_text_top_terms_releases_its_persist(spark):
    """r14 verdict ask #7 (closed r15): gates must release what they
    persist.  text_top_terms wraps doc_top_terms in an .orderBy, which
    drops the _sm_caches tag unless re-attached — the one leaker the
    harness cache sweep caught.  Pin: the gate's output carries the tag,
    and release_caches + GC leaves zero persistent RDDs."""
    import gc
    import time

    from scholarmind_spark.operators.textstats import doc_top_terms
    from scholarmind_spark.util import release_caches

    def settled_count() -> int:
        # nudge FIRST, then measure (r15 ADVICE): the ContextCleaner is
        # asynchronous, so measuring before the gc/sleep left the last
        # nudge dead and the returned count one settle-window stale
        n = spark.sparkContext._jsc.getPersistentRDDs().size()
        for attempt in range(6):
            if n == 0:
                break
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.2 * (attempt + 1))
            n = spark.sparkContext._jsc.getPersistentRDDs().size()
        return n

    # relative to the session baseline: another test file sharing this
    # session may legitimately hold a referenced persisted frame
    n0 = settled_count()

    d = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta gamma gamma gamma")],
        "doc_id long, text string",
    )
    out = doc_top_terms(d, k=2)
    tagged = out.orderBy("id", "rank")
    # the raw orderBy drops the tag — the exact leak shape
    assert getattr(tagged, "_sm_caches", []) == []
    from scholarmind_spark.util import attach_caches

    fixed = attach_caches(tagged, list(getattr(out, "_sm_caches", ())))
    assert len(fixed._sm_caches) == 1
    fixed.collect()
    release_caches(fixed)
    assert settled_count() <= n0
