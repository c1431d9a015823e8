"""A1 priority dedup: priority survival, null/empty exemption, DOI variants
normalizing equal, same-priority tiebreak determinism (SURVEY §5 item 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scholarmind_spark.operators.dedup import dedup_exact, priority_dedup


def mk(spark, rows):
    return spark.createDataFrame(
        rows, "record_id long, source_type string, doi string, title string"
    )


def surviving_ids(df):
    return sorted(r.record_id for r in df.select("record_id").collect())


def test_priority_wins(spark):
    df = mk(
        spark,
        [
            (1, "sciencedirect", "10.1/x", "sd"),
            (2, "pubmed", "10.1/x", "pm"),
            (3, "wos", "10.1/x", "wos"),
        ],
    )
    assert surviving_ids(priority_dedup(df)) == [3]


def test_doi_variants_normalize_equal(spark):
    df = mk(
        spark,
        [
            (1, "wos", "10.1/x", "a"),
            (2, "pubmed", "https://doi.org/10.1/X", "b"),
            (3, "pubmed", "doi:10.1/x ", "c"),
            (4, "sciencedirect", "10.1/x [doi]", "d"),
            (5, "sciencedirect", "somepii, 10.1/x", "e"),
        ],
    )
    assert surviving_ids(priority_dedup(df)) == [1]


def test_null_and_empty_doi_all_kept(spark):
    df = mk(
        spark,
        [
            (1, "wos", None, "a"),
            (2, "wos", None, "b"),
            (3, "pubmed", "", "c"),
            (4, "pubmed", "", "d"),
            (5, "pubmed", "10.9/z", "e"),
            (6, "sciencedirect", "10.9/z", "f"),
        ],
    )
    assert surviving_ids(priority_dedup(df)) == [1, 2, 3, 4, 5]


def test_same_priority_tiebreak_is_min_record_id(spark):
    df = mk(
        spark,
        [
            (9, "pubmed", "10.1/t", "later"),
            (2, "pubmed", "10.1/t", "earlier"),
        ],
    )
    assert surviving_ids(priority_dedup(df)) == [2]


def test_unknown_source_gets_priority_zero(spark):
    df = mk(
        spark,
        [
            (1, "mystery", "10.1/q", "m"),
            (2, "sciencedirect", "10.1/q", "sd"),
        ],
    )
    assert surviving_ids(priority_dedup(df)) == [2]


def test_keep_key_exposes_doi_norm(spark):
    df = mk(spark, [(1, "wos", "DOI:10.1/A", "a"), (2, "wos", None, "b")])
    out = priority_dedup(df, keep_key=True)
    got = {r.record_id: r.doi_norm for r in out.collect()}
    assert got == {1: "doi:10.1/a", 2: ""}


def test_dedup_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),  # same after whitespace/case normalization
            (3, "different"),
        ],
        "doc_id long, text string",
    )
    out = dedup_exact(df)
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_fuzzy_nodoi_pass_collapses_near_dup_titles(spark):
    from scholarmind_spark.operators.dedup import fuzzy_title_dedup

    df = mk(
        spark,
        [
            # same paper, no DOI, three sources: titles within 2 edits
            (1, "sciencedirect", None, "Graph Sampling at Scale"),
            (2, "wos", "", "graph sampling at scale"),   # exact after lower
            (3, "pubmed", None, "Graph Samplng at Scale"),  # 1 edit
            # distinct no-DOI paper: far from everything, survives
            (4, "pubmed", None, "Quantum Error Correction Basics"),
            # DOI rows are exempt from the fuzzy pass even with near titles
            (5, "pubmed", "10.1/x", "Graph Sampling at Scale"),
            # null-title no-DOI rows are exempt (cannot match anything)
            (6, "sciencedirect", None, None),
            (7, "wos", None, ""),
        ],
    )
    out = priority_dedup(df, keep_key=True, fuzzy_nodoi=True)
    # wos (prio 3) wins the fuzzy cluster {1,2,3}; DOI row 5 untouched
    assert surviving_ids(out) == [2, 4, 5, 6, 7]


def test_fuzzy_pass_equal_priority_tiebreak_and_exact_titles(spark):
    from scholarmind_spark.operators.dedup import fuzzy_title_dedup

    df = mk(
        spark,
        [
            (10, "pubmed", None, "Same   Title"),  # whitespace collapses
            (11, "pubmed", None, "same title"),
            (12, "pubmed", None, "same titel"),  # 2 edits, same prio
        ],
    )
    out = fuzzy_title_dedup(df)
    # equal priority: smallest record_id dominates the whole cluster
    assert surviving_ids(out) == [10]


def test_fuzzy_pass_numeral_guard_keeps_versioned_titles(spark):
    from scholarmind_spark.operators.dedup import fuzzy_title_dedup

    df = mk(
        spark,
        [
            # 1 edit apart but DISTINCT works: numeral sequences differ
            (20, "wos", None, "Graph Mining Part i"),
            (21, "pubmed", None, "Graph Mining Part ii"),
            (22, "wos", None, "Methods Study 1"),
            (23, "pubmed", None, "Methods Study 2"),
            # a real typo with equal (empty) numeral sequences still merges
            (24, "wos", None, "Graph Sampling at Scale"),
            (25, "pubmed", None, "Graph Samplng at Scale"),
        ],
    )
    out = fuzzy_title_dedup(df)
    assert surviving_ids(out) == [20, 21, 22, 23, 24]


def test_fuzzy_pass_hot_title_cap_skips_fuzzy_keeps_exact(spark):
    from scholarmind_spark.operators.dedup import fuzzy_title_dedup

    rows = [(100 + i, "pubmed", None, "editorial") for i in range(6)]
    rows += [(200, "wos", None, "editoriaX")]  # 1 edit from the hot key
    df = mk(spark, rows)
    out = fuzzy_title_dedup(df, max_title_df=5)
    # exact-equal dedup still collapses the hot cluster (per-key best,
    # skew-free aggregation), but the hot key is excluded from FUZZY
    # matching, so the 1-edit neighbor survives
    assert surviving_ids(out) == [100, 200]


def test_fuzzy_pass_matches_brute_force_dominance(spark):
    """Semantics pin, independent of PassJoin candidate generation: on a
    seeded random corpus, fuzzy_title_dedup must equal the brute-force
    dominance rule — drop r iff some s has (equal key OR (lev <= 2 AND
    equal numeral sequences)) and better (prio, -id)."""
    import random
    import re as _re

    from scholarmind_spark.operators.dedup import fuzzy_title_dedup

    def lev(a, b):
        if abs(len(a) - len(b)) > 2:
            return 3  # bounded early exit, enough for max_dist=2
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def norm(t):
        return _re.sub(r"\s+", " ", t.lower()).strip()

    def nums(tk):
        return " ".join(
            t for t in tk.split(" ")
            if _re.fullmatch(
                r"[0-9]+|x{0,3}(ix|iv|v?i{1,3})|x{1,3}(ix|iv|v?i{0,3})|v", t
            )
        )

    rng = random.Random(8)
    words = ["graph", "mining", "scale", "study", "deep", "data"]
    rows = []
    for i in range(40):
        t = " ".join(rng.sample(words, 3))
        styled = t.upper() if rng.random() < 0.3 else t
        if rng.random() < 0.3:
            styled += " " + rng.choice(["i", "ii", "1", "2"])
        if rng.random() < 0.3:  # 1-char typo
            p = rng.randrange(len(styled))
            styled = styled[:p] + rng.choice("xyz") + styled[p + 1:]
        src = rng.choice(["wos", "pubmed", "sciencedirect", "other"])
        rows.append((i, src, None, styled))
    prio = {"wos": 3, "pubmed": 2, "sciencedirect": 1, "other": 0}

    elig = [(i, norm(t), prio[s]) for i, s, _, t in rows if norm(t)]
    dropped = set()
    for i, tk, p in elig:
        for j, tk2, p2 in elig:
            if i == j:
                continue
            match = tk == tk2 or (
                lev(tk, tk2) <= 2 and nums(tk) == nums(tk2)
            )
            if match and (p2 > p or (p2 == p and j < i)):
                dropped.add(i)
                break
    want = sorted(i for i, *_ in rows if i not in dropped)

    out = fuzzy_title_dedup(mk(spark, rows))
    assert surviving_ids(out) == want
