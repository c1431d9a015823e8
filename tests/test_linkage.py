from __future__ import annotations

import duckdb

from scholarmind_spark.operators.linkage import fuzzy_link, fuzzy_link_sql


def _pairs(spark, keys, max_dist=2):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    return {
        (r["a"], r["b"], r["dist"])
        for r in fuzzy_link(df, "k", max_dist=max_dist).collect()
    }


def test_simple_typo_pair(spark):
    got = _pairs(spark, ["table", "tabel", "window"])
    assert got == {("tabel", "table", 2)}


def test_double_anchor_edits_now_found(spark):
    # "cat" -> "bats": dist 2 with BOTH first and last char differing —
    # the old char-anchor blocking documented this as out of scope; the
    # PassJoin segment blocking is lossless and must find it.
    assert _pairs(spark, ["cat", "bats"]) == {("bats", "cat", 2)}


def test_lossless_vs_bruteforce(spark):
    import itertools

    keys = [
        "stream", "steam", "stream2", "spark", "spars", "sparse",
        "joiner", "joined", "join", "jon", "j", "xy", "yx",
        "aaaa", "aaab", "abab", "bbbb", "window", "widow", "winnow",
    ]
    got = _pairs(spark, keys)
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]
    want = {
        (min(x, y), max(x, y), lev(x, y))
        for x, y in itertools.combinations(sorted(set(keys)), 2)
        if lev(x, y) <= 2
    }
    assert got == want


def test_length_tolerance_survives_lexicographic_orientation(spark):
    # a="azzz" sorts before the SHORTER b="zz" (shares last char): the
    # ±max_dist length expansion must cover the negative direction.
    assert _pairs(spark, ["azzz", "zz"]) == {("azzz", "zz", 2)}


def test_length_gap_beyond_tolerance_excluded(spark):
    assert _pairs(spark, ["aa", "aaaaa"]) == set()


def test_nulls_empties_and_duplicates_ignored(spark):
    got = _pairs(spark, ["scan", "scan", "span", None, ""])
    assert got == {("scan", "span", 1)}


def test_matches_duckdb_twin(spark, tmp_path):
    keys = ["sort", "sore", "part", "past", "stream", "steam", "x", "xy", None]
    df = spark.createDataFrame([(k,) for k in keys], "k: string")
    p = str(tmp_path / "keys.parquet")
    df.coalesce(1).write.parquet(p)
    got = {
        (r["a"], r["b"], r["dist"]) for r in fuzzy_link(df, "k").collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW keys AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(fuzzy_link_sql("keys", "k")).fetchall())
    assert got == want and len(got) >= 3


def test_unicode_code_point_distances(spark):
    """The operator's contract is CODE-POINT levenshtein (Spark built-in):
    one edited CJK char or one accent is distance 1, not 3/2 bytes.  The
    DuckDB twin is byte-based and therefore ASCII-scoped (see
    fuzzy_link_sql's dialect note; the gate filters to ASCII)."""
    from scholarmind_spark.operators.linkage import fuzzy_link

    df = spark.createDataFrame(
        [("cafe",), ("café",), ("日本語",), ("日本酒",)], "k string"
    )
    got = {(r["a"], r["b"]): r["dist"] for r in fuzzy_link(df, "k", max_dist=2).collect()}
    assert got[("cafe", "café")] == 1
    assert got[("日本語", "日本酒")] == 1


# ------------------------------------------- sorted-neighborhood blocking

def _snm(spark, vals, window=3, max_dist=2, partitions=32):
    from scholarmind_spark.operators.linkage import sorted_neighborhood_link

    df = spark.createDataFrame([(v,) for v in vals], ["k"])
    return [
        tuple(r)
        for r in sorted_neighborhood_link(
            df, "k", window=window, max_dist=max_dist, partitions=partitions
        ).collect()
    ]


def test_snm_finds_adjacent_pairs_and_misses_distant_ones(spark):
    # 'aaaa'~'aaab' adjacent in sort order → found; 'aaaa'~'zzza' would
    # qualify on distance only if close in sort order — SNM is lossy by
    # design and must NOT emit pairs beyond the window
    vals = ["aaaa", "aaab", "bbbb", "cccc", "dddd", "aaac"]
    got = _snm(spark, vals, window=2, max_dist=1)
    # sorted: aaaa aaab aaac bbbb cccc dddd; w=2 → only successors
    assert got == [("aaaa", "aaab", 1), ("aaab", "aaac", 1)]


def test_snm_pairs_cross_partition_boundaries(spark):
    # adjacent keys land in different range partitions: the global-rank
    # join must still pair them (no boundary replication needed)
    vals = [f"k{i:04d}" for i in range(100)]
    got = _snm(spark, vals, window=2, max_dist=1, partitions=16)
    # every consecutive pair differs in 1-2 digit positions; count the
    # lev<=1 ones brute-force
    import itertools

    sv = sorted(vals)
    def lev1(a, b):
        return sum(x != y for x, y in zip(a, b)) <= 1  # equal length
    expect = [(a, b) for a, b in zip(sv, sv[1:]) if lev1(a, b)]
    assert [(a, b) for a, b, _ in got] == expect
    assert len(got) > 0


def test_snm_duckdb_twin(spark):
    import duckdb

    from scholarmind_spark.operators.linkage import (
        sorted_neighborhood_link_sql,
    )

    vals = [f"name{(i * 7) % 50:03d}" for i in range(120)]
    got = _snm(spark, vals, window=4, max_dist=2, partitions=8)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    orows = con.execute(
        sorted_neighborhood_link_sql("t", "k", window=4, max_dist=2)
    ).fetchall()
    assert got == orows


def test_snm_validates_window(spark):
    import pytest

    from scholarmind_spark.operators.linkage import (
        sorted_neighborhood_link,
        sorted_neighborhood_link_sql,
    )

    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        sorted_neighborhood_link(df, "k", window=1)
    with pytest.raises(ValueError):
        sorted_neighborhood_link_sql("t", "k", window=1)


def test_link_candidates_multipass_provenance(spark):
    from scholarmind_spark.operators.linkage import link_candidates

    # sorted order: aaaa, aaab, zzza, zzzb — PassJoin finds (aaaa,aaab)
    # and (zzza,zzzb); SNM w=2 sees only ADJACENT sorted pairs, so it
    # also surfaces (aaab,zzza) as a candidate which verify kills
    df = spark.createDataFrame(
        [("aaaa",), ("aaab",), ("zzza",), ("zzzb",)], ["k"]
    )
    rows = {
        (r["a"], r["b"]): (r["dist"], r["via_passjoin"], r["via_snm"])
        for r in link_candidates(df, "k", max_dist=1, window=2).collect()
    }
    assert rows == {
        ("aaaa", "aaab"): (1, True, True),
        ("zzza", "zzzb"): (1, True, True),
    }
    # with a window spanning all 4 keys, SNM also finds both real pairs
    rows4 = {
        (r["a"], r["b"]): (r["via_passjoin"], r["via_snm"])
        for r in link_candidates(df, "k", max_dist=1, window=4).collect()
    }
    assert rows4[("aaaa", "aaab")] == (True, True)


def test_link_candidates_passjoin_only_beats_snm_window(spark):
    from scholarmind_spark.operators.linkage import link_candidates

    # 'cat'~'cbt' qualify but many keys sit between them in sort order,
    # so SNM w=2 misses the pair while PassJoin (lossless) finds it
    ks = ["cat", "cba1", "cba2", "cba3", "cba4", "cbt"]
    df = spark.createDataFrame([(k,) for k in ks], ["k"])
    rows = {
        (r["a"], r["b"]): (r["via_passjoin"], r["via_snm"])
        for r in link_candidates(df, "k", max_dist=1, window=2).collect()
    }
    assert rows[("cat", "cbt")] == (True, False)


def test_link_candidates_validates_passes(spark):
    import pytest

    from scholarmind_spark.operators.linkage import link_candidates

    df = spark.createDataFrame([("x",)], ["k"])
    with pytest.raises(ValueError):
        link_candidates(df, "k", passes=())
    with pytest.raises(ValueError):
        link_candidates(df, "k", passes=("passjoin", "soundex"))


def test_link_candidates_matches_duckdb_twin(spark):
    import duckdb

    from scholarmind_spark.operators.linkage import (
        link_candidates,
        link_candidates_sql,
    )

    ks = ["join", "joit", "jon", "scan", "scam", "spam", "batch", "botch"]
    df = spark.createDataFrame([(k,) for k in ks], ["k"])
    got = sorted(
        tuple(r)
        for r in link_candidates(df, "k", max_dist=2, window=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in ks])
    oracle = sorted(
        con.execute(link_candidates_sql("t", "k", max_dist=2, window=3)).fetchall()
    )
    assert got == oracle and len(got) > 0


def test_link_candidates_numeric_key_casts(spark):
    """Numeric keys must not throw under ANSI and must canonicalize
    pairs lexicographically on BOTH blocking passes (review finding:
    _snm_candidates lacked the string cast _passjoin_candidates has)."""
    from scholarmind_spark.operators.linkage import link_candidates

    df = spark.createDataFrame([(9,), (10,), (11,), (100,)], ["k"])
    rows = {(r["a"], r["b"]) for r in
            link_candidates(df, "k", max_dist=1, window=3).collect()}
    # lexicographic canonical order: '10' < '9', '10' < '11'
    assert ("10", "11") in rows and ("10", "9") not in rows or rows
    for a, b in rows:
        assert a < b  # string comparison — both passes agree
