from __future__ import annotations

import math

import duckdb

from scholarmind_spark.operators.lm import bigram_lm_score, bigram_lm_score_sql
from scholarmind_spark.util import release_caches


def _score(df, **kw):
    out = bigram_lm_score(df, **kw)
    rows = out.collect()
    release_caches(out)
    return rows


def test_known_two_doc_corpus(spark):
    # corpus bigrams: (a,b) x2, (b,a) x1 ; C(a)=2, C(b)=1, V=2
    df = spark.createDataFrame([(1, "a b a"), (2, "a b")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in _score(df)}
    p_ab = (2 + 1) / (2 + 2)  # C(a,b)+1 / C(a)+V
    p_ba = (1 + 1) / (1 + 2)
    t_ab = round(-math.log(p_ab) * 1e6)
    t_ba = round(-math.log(p_ba) * 1e6)
    assert rows[1]["n_bigrams"] == 2
    assert rows[1]["nll_micro"] == (t_ab + t_ba + 1) // 2
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["nll_micro"] == t_ab


def test_single_token_docs_are_omitted(spark):
    df = spark.createDataFrame(
        [(1, "only"), (2, ""), (3, None), (4, "two words")], ["doc_id", "text"]
    )
    got = {r["doc_id"] for r in _score(df)}
    assert got == {4}


def test_heldout_unseen_bigrams_use_smoothing(spark):
    train = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    held = spark.createDataFrame([(9, "b b"), (8, "q q")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r["nll_micro"]
        for r in _score(held, train_df=train)
    }
    # C(b)=1 (b starts one train bigram), V=2: P(b|b) = 1/(1+2)
    assert rows[9] == round(-math.log(1 / 3) * 1e6)
    # q unseen entirely: P = 1/(0+V) = 1/2
    assert rows[8] == round(-math.log(1 / 2) * 1e6)


def test_gibberish_scores_worse_than_fluent(spark):
    fluent = " ".join(["the cat sat on the mat"] * 10)
    gibber = "zq xv jk wp mn bd tg rc lh fy"
    df = spark.createDataFrame(
        [(1, fluent), (2, gibber)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["nll_micro"] for r in _score(df)}
    assert rows[2] > rows[1]


def test_matches_duckdb_twin(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["x y z x", "y x y", "z z z q", "x", None, "q z y x w"]
        )],
        ["doc_id", "text"],
    )
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(p)
    got = {
        (r["doc_id"], r["n_bigrams"], r["nll_micro"])
        for r in _score(df)
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM '{p}/*.parquet'")
    want = set(con.sql(bigram_lm_score_sql("docs")).fetchall())
    assert got == want


def test_collocations_rank_known_pairs(spark):
    from scholarmind_spark.operators.lm import collocations

    # "new york" always together (PMI high); "the x" spread everywhere
    docs = [(i, f"new york w{i} the a{i % 3} the b{i % 2}") for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = collocations(df, min_count=5, k=5)
    rows = out.collect()
    release_caches(out)
    assert rows[0]["u"] == "new" and rows[0]["v"] == "york"
    assert all(r["c_uv"] >= 5 for r in rows)
    assert rows[0]["pmi_micro"] > rows[-1]["pmi_micro"]


def test_collocations_match_duckdb(spark, tmp_path):
    from scholarmind_spark.operators.lm import collocations, collocations_sql

    docs = [(i, " ".join(f"t{(i * j) % 7}" for j in range(12))) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    out = collocations(df, min_count=3, k=10)
    got = [(r["u"], r["v"], r["c_uv"], r["pmi_micro"]) for r in out.collect()]
    release_caches(out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW d AS SELECT * FROM '{p}/*.parquet'")
    want = con.sql(collocations_sql("d", min_count=3, k=10)).fetchall()
    assert got == want and len(got) == 10


def test_perplexity_buckets_split_per_language(spark):
    """9 docs across 2 languages: each language's ranking cuts into
    head/middle/tail independently, ordered by (nll_micro, doc_id)."""
    from scholarmind_spark.operators.lm import perplexity_buckets

    fluent = "the cat sat on the mat and the cat slept on the mat"
    rows = []
    # 6 'en' docs: 3 fluent twins (low nll), 3 unique-gibberish (high)
    for i in range(3):
        rows.append((i, fluent, "en"))
    for i in range(3, 6):
        rows.append((i, f"zx{i} qq{i} vv{i} kk{i} jj{i} ww{i}", "en"))
    # 3 'de' docs
    for i in range(6, 9):
        rows.append((i, f"der hund lief schnell weg heute {i}", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(df)
    got = {r.doc_id: r for r in out.collect()}
    release_caches(out)
    assert len(got) == 9
    # per-language bucket sizes are equal-depth (6 → 2/2/2, 3 → 1/1/1)
    en = [got[i] for i in range(6)]
    de = [got[i] for i in range(6, 9)]
    assert sorted(r.bucket for r in en) == [1, 1, 2, 2, 3, 3]
    assert sorted(r.bucket for r in de) == [1, 2, 3]
    assert {r.tier for r in en} == {"head", "middle", "tail"}
    # the fluent twins outrank the gibberish inside 'en'
    fluent_buckets = {got[i].bucket for i in range(3)}
    gib_buckets = {got[i].bucket for i in range(3, 6)}
    assert max(fluent_buckets) <= min(gib_buckets)


def test_perplexity_buckets_match_duckdb(spark, tmp_path):
    from scholarmind_spark.operators.lm import (
        perplexity_buckets,
        perplexity_buckets_sql,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = perplexity_buckets(df).orderBy("doc_id")
    got = [(r.doc_id, r.lang, r.n_bigrams, r.nll_micro, r.bucket, r.tier)
           for r in out.collect()]
    release_caches(out)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.sql(
        "SELECT * FROM (" + perplexity_buckets_sql("documents") + ") ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(w) for w in want]
