"""Losslessness of the AllPairs/PPJoin prefix filter in the exact pair
listers: the prefix-filtered plans must return EXACTLY the pairs a
brute-force all-pairs computation finds — across thresholds, duplicate
clusters, contained docs, and docs shorter than the shingle width.

(The per-doc α uses the asymmetric two-sided prefix lemma: with hashes in
one global sorted order and inter ≥ α_x for BOTH sides' α, the prefixes of
lengths m_x − α_x + 1 intersect — proof sketch in the operator docstring;
these tests are the empirical check.)"""

from __future__ import annotations

import itertools

from scholarmind_spark.operators.neardup import (
    SHINGLE_K,
    containment_pairs,
    ngram_jaccard_pairs,
)


def _shingles(text: str, k: int = SHINGLE_K) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


DOCS = [
    # a 3-doc near-dup cluster
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (3, "alpha beta gamma delta epsilon zeta eta theta mu kappa"),
    # short doc fully contained in a long one (low jaccard, high containment)
    (4, "one two three four five six"),
    (5, "zero one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen"),
    # unrelated docs
    (6, "completely different words about completely other topics here now"),
    (7, "sub shingle"),  # shorter than k → single degenerate shingle
    (8, "sub shingle"),  # identical twin of 7
]


def _brute_jaccard(threshold: float):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        a, b = _shingles(ta), _shingles(tb)
        j = round(len(a & b) / len(a | b), 6)
        if j >= threshold:
            out[(ia, ib)] = j
    return out

def _brute_containment(tau_permille: int):
    out = {}
    for (ia, ta), (ib, tb) in itertools.permutations(DOCS, 2):
        a, b = _shingles(ta), _shingles(tb)
        inter = len(a & b)
        if inter * 1000 >= tau_permille * len(a):
            out[(ia, ib)] = (inter * 1000) // len(a)
    return out


def test_jaccard_prefix_filter_lossless(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for t in (0.3, 0.6, 0.8, 0.95):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, threshold=t).collect()
        }
        assert got == _brute_jaccard(t), f"threshold {t}"


def test_incremental_matches_self_join_cross_subset(spark):
    """ngram_jaccard_against(new, corpus) must equal the cross-side subset
    of ngram_jaccard_pairs(new ∪ corpus) — same df-cap base, same values —
    and must NOT list new-vs-new or corpus-vs-corpus pairs."""
    from scholarmind_spark.operators.neardup import ngram_jaccard_against

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    new = df.filter("doc_id % 2 = 1")
    corpus = df.filter("doc_id % 2 = 0")
    for t in (0.3, 0.6):
        got = {
            (r["new_id"], r["corpus_id"]): r["jaccard"]
            for r in ngram_jaccard_against(new, corpus, threshold=t).collect()
        }
        want = {}
        for (a, b), j in _brute_jaccard(t).items():
            if a % 2 != b % 2:  # cross-side only, keyed new→corpus
                want[(a, b) if a % 2 == 1 else (b, a)] = j
        assert got == want, f"threshold {t}"


def test_containment_prefix_filter_lossless(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for tau in (500, 800, 1000):
        got = {
            (r["inner_id"], r["outer_id"]): r["containment_permille"]
            for r in containment_pairs(df, tau_permille=tau).collect()
        }
        assert got == _brute_containment(tau), f"tau {tau}"
