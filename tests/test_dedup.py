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
