"""Near-dup operator tests: shingle df-cap and cache hygiene.

The value-level correctness of all three near-dup operators is covered by
the DuckDB oracle gate (tools/check_correctness.py); these tests cover the
scale guards the oracle can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scholarmind_spark.operators.neardup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from scholarmind_spark.util import release_caches


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_ngram_df_cap_bounds_common_shingle_blowup(spark):
    """10⁴ docs sharing one boilerplate shingle: uncapped, that single key
    would contribute ~5·10⁷ join pairs; with the df-cap the shingle drops
    before the self-join and only genuinely-shared rare shingles pair up."""
    boiler = "terms of service apply to everyone"
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(boiler + " unique token stream number "), F.col("id")).alias("text"),
    )
    # Two true near-dups sharing a RARE shingle tail (df=2, far below cap).
    twins = spark.createDataFrame(
        [
            (20_001, boiler + " shared rare ending alpha beta gamma delta"),
            (20_002, boiler + " shared rare ending alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(
        docs.union(twins), threshold=0.3, max_df=100
    )
    rows = pairs.collect()
    release_caches(pairs)
    # Only the twin pair survives; the 10⁴-doc boilerplate key creates none.
    assert [(r.id_a, r.id_b) for r in rows] == [(20_001, 20_002)]


def test_ngram_cap_is_noop_below_df(spark):
    """When no shingle's df exceeds the cap, capped == uncapped exactly."""
    docs = spark.createDataFrame(
        [(i, f"alpha bravo charlie delta echo fox{i % 20} golf hotel india") for i in range(40)],
        "doc_id long, text string",
    )
    capped = ngram_jaccard_pairs(docs, threshold=0.2, max_df=1000)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.2, max_df=10**9)
    got_c = sorted((r.id_a, r.id_b, r.jaccard) for r in capped.collect())
    got_u = sorted((r.id_a, r.id_b, r.jaccard) for r in uncapped.collect())
    release_caches(capped)
    release_caches(uncapped)
    assert got_c == got_u and len(got_c) > 0


def test_neardup_operators_release_all_caches(spark):
    """Every near-dup operator's intermediate persist()s are released by
    release_caches(): no persistent RDDs remain after consumption."""
    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"one two three four five six{i % 4} seven eight nine ten") for i in range(30)],
        "doc_id long, text string",
    )
    for op in (
        lambda d: ngram_jaccard_pairs(d, threshold=0.3),
        lambda d: minhash_lsh_pairs(d, threshold=0.3),
        lambda d: simhash_pairs(d, max_distance=5),
    ):
        out = op(docs)
        out.collect()
        assert _n_cached(spark) > 0  # the operator did cache while running
        release_caches(out)
        assert _n_cached(spark) == 0


def test_containment_detects_embedded_doc(spark):
    from scholarmind_spark.operators.neardup import containment_pairs
    from scholarmind_spark.util import release_caches

    long_text = " ".join(f"w{i}" for i in range(60))
    short = " ".join(f"w{i}" for i in range(20, 32))  # fully inside
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, long_text), (2, short), (3, other)], "doc_id long, text string"
    )
    out = containment_pairs(df, tau_permille=900)
    rows = {(r["inner_id"], r["outer_id"]): r["containment_permille"]
            for r in out.collect()}
    release_caches(out)
    # short is 100% contained in long; the reverse is far below tau
    assert rows == {(2, 1): 1000}


def test_containment_matches_duckdb(spark, tmp_path):
    from scholarmind_spark.operators.neardup import (
        containment_pairs, containment_pairs_sql,
    )
    from scholarmind_spark.util import release_caches
    import duckdb

    docs = [(i, " ".join(f"t{(i * 3 + j) % 40}" for j in range(25))) for i in range(20)]
    docs += [(100, " ".join(f"t{(5 * 3 + j) % 40}" for j in range(8)))]  # sub-doc
    df = spark.createDataFrame(docs, "doc_id long, text string")
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    out = containment_pairs(df, tau_permille=700)
    got = {tuple(r) for r in out.collect()}
    release_caches(out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW d AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(containment_pairs_sql("d", tau_permille=700)).fetchall())
    assert got == want and got


def test_band_cap_drops_duplicate_cluster_buckets(spark):
    """A cluster of identical docs shares EVERY band key — with a cap
    below the cluster size the band self-join skips those buckets (exact
    dedup owns identical docs), while a distinct near-dup pair that only
    collides in an uncapped bucket still surfaces."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, "clone text " + base) for i in range(25)]  # 25-identical cluster
    # the standalone near-dup pair shares NO tokens with the cluster, so
    # its band keys cannot land in the capped buckets; 60 shared tokens
    # + 1 differing keeps the hamming distance low (majority margins are
    # wide at this length)
    other = " ".join(f"tok{i}" for i in range(60))
    rows += [(100, other + " extra"), (101, other + " extrb")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = simhash_pairs(df, max_distance=10, band_max_df=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    release_caches(capped)
    # the identical-cluster pairs are gone (their buckets exceed the cap)
    assert not any(a < 25 and b < 25 for a, b in got)
    # the small-bucket near-dup pair survives
    assert (100, 101) in got

    uncapped = simhash_pairs(df, max_distance=10, band_max_df=None)
    got_u = {(r.id_a, r.id_b) for r in uncapped.collect()}
    release_caches(uncapped)
    assert any(a < 25 and b < 25 for a, b in got_u)


def test_uncapped_sql_twins_match_uncapped_spark(spark, tmp_path):
    """band_max_df=None must emit VALID SQL (no `HAVING count(*) > None`)
    and match the uncapped Spark path pair-for-pair on both LSH variants."""
    import duckdb

    from scholarmind_spark.operators.neardup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_sql,
        simhash_pairs,
        simhash_pairs_sql,
    )

    base = " ".join(f"w{i}" for i in range(30))
    rows = [(1, base + " tail one"), (2, base + " tail two"),
            (3, " ".join(f"z{i}" for i in range(30)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW d AS SELECT * FROM '{p}/*.parquet'")

    mh = minhash_lsh_pairs(df, threshold=0.5, band_max_df=None)
    got_mh = {(r.id_a, r.id_b) for r in mh.collect()}
    release_caches(mh)
    want_mh = {(a, b) for a, b, _ in con.sql(
        minhash_lsh_pairs_sql("d", threshold=0.5, band_max_df=None)
    ).fetchall()}
    assert got_mh == want_mh and got_mh

    sh = simhash_pairs(df, max_distance=15, band_max_df=None)
    got_sh = {(r.id_a, r.id_b) for r in sh.collect()}
    release_caches(sh)
    want_sh = {(a, b) for a, b, _ in con.sql(
        simhash_pairs_sql("d", max_distance=15, band_max_df=None)
    ).fetchall()}
    assert got_sh == want_sh and got_sh
