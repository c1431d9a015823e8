"""Word-repetition quality signals and benchmark decontamination."""

from __future__ import annotations

from scholarmind_spark.operators.decontam import decontamination_overlap
from scholarmind_spark.operators.textstats import word_repetition


def test_word_repetition_fractions(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # top word 3/4, dups 3/4
            (2, "x y z"),            # no repeats
        ],
        ["doc_id", "text"],
    )
    got = {r.id: r for r in word_repetition(df).collect()}
    assert got[1].n_words == 4 and got[1].n_distinct == 2
    assert got[1].top_word_frac == 0.75 and got[1].dup_word_frac == 0.75
    assert got[2].n_words == 3 and got[2].n_distinct == 3
    assert got[2].top_word_frac == round(1 / 3, 6) and got[2].dup_word_frac == 0.0


def test_decontamination_flags_shared_ngrams(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox runs far away"),  # shares 2 3-grams
            (2, "completely different words entirely here"),
            (3, "quick brown fox jumps high"),  # shares 2 3-grams
        ],
        ["doc_id", "text"],
    )
    got = {r.id: r.n_shared for r in decontamination_overlap(
        corpus, bench, k=3, min_overlap=2
    ).collect()}
    assert set(got) == {1, 3}
    assert got[1] == 2 and got[3] == 2


def test_decontamination_threshold_excludes_weak_overlap(spark):
    bench = spark.createDataFrame([(100, "alpha beta gamma delta")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma nothing else at all")], ["doc_id", "text"]
    )
    # shares exactly ONE 3-gram -> below min_overlap=2
    assert decontamination_overlap(corpus, bench, k=3, min_overlap=2).count() == 0
    assert decontamination_overlap(corpus, bench, k=3, min_overlap=1).count() == 1


def test_mixture_sample_proportions_and_determinism(spark):
    from scholarmind_spark.operators.sampling import mixture_sample

    rows = (
        [(i, "a") for i in range(1000)]
        + [(i + 10_000, "b") for i in range(200)]
        + [(i + 20_000, "c") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "doc_id long, cls string")
    # target 50/50 a/b: b is binding (200 rows / 0.5 weight), so keep ALL
    # of b and ~200 of a; c is absent from the weights and dropped
    out = mixture_sample(df, key="doc_id", class_col="cls",
                         target_weights={"a": 0.5, "b": 0.5})
    got = {r.cls: r.n for r in out.groupBy("cls").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
    ).collect()}
    assert "c" not in got
    assert got["b"] == 200                     # binding class fully kept
    assert abs(got["a"] - 200) <= 40           # hash-sampled to proportion
    # deterministic: same call, same rows
    again = mixture_sample(df, key="doc_id", class_col="cls",
                           target_weights={"a": 0.5, "b": 0.5})
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_url_domain_stats(spark):
    from scholarmind_spark.operators.textstats import url_domain_stats

    df = spark.createDataFrame(
        [
            (1, "see https://www.Foo.com/a and https://foo.com/b plus http://bar.org/x"),
            (2, "nothing here"),
            (3, "again https://FOO.com/c"),
        ],
        "doc_id long, text string",
    )
    rows = {r.domain: (r.n_docs, r.n_urls) for r in url_domain_stats(df).collect()}
    # www./case variants collapse; doc 1 mentions foo.com twice but counts once
    assert rows == {"foo.com": (2, 3), "bar.org": (1, 1)}


def test_weighted_sample_biases_toward_weight(spark):
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.sampling import weighted_sample

    # 500 light rows (w=1) vs 500 heavy rows (w=100): a 100-row weighted
    # sample must be dominated by heavy rows (each is ~100x more likely)
    rows = [(i, 1) for i in range(500)] + [(i + 1000, 100) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    out = weighted_sample(df, key="doc_id", weight_col="w", n=100)
    got = out.collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r.w == 100)
    assert heavy >= 90
    # deterministic: same call, same rows
    again = weighted_sample(df, key="doc_id", weight_col="w", n=100)
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again.collect())


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from scholarmind_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 10)], "doc_id long, w int"
    )
    ids = {r.doc_id for r in weighted_sample(df, "doc_id", "w", n=10).collect()}
    assert ids == {3, 4}


def test_stratified_sample_boundary_rate_cross_engine(spark):
    """A rate whose rate*buckets lands exactly on .5: DuckDB's ::BIGINT
    cast ROUNDS while Spark's cast truncates — the twin must floor() so
    both engines keep the identical bucket set (r6 review finding)."""
    import duckdb

    from scholarmind_spark.operators.sampling import (
        stratified_sample,
        stratified_sample_sql,
    )

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "k long, lang string")
    rate = 0.0333335  # * 1_000_000 = 33333.5 — the rounding boundary
    got = sorted(
        r["k"] for r in stratified_sample(df, "k", "lang", {"en": rate, "de": rate}).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    pred = stratified_sample_sql("k", "lang", {"en": rate, "de": rate})
    want = sorted(k for (k,) in con.execute(f"SELECT k FROM t WHERE {pred}").fetchall())
    assert got == want


def test_split_leakage_audit_counts(spark):
    # construct a corpus where doc B is a near-copy of doc A and the
    # split is forced by key choice; the audit must count exactly the
    # cross-split near-dup pairs
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.neardup import ngram_jaccard_against
    from scholarmind_spark.operators.sampling import deterministic_split

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (i, base if i < 2 else f"totally different text number {i} " * 3)
        for i in range(40)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    s = deterministic_split(d, "doc_id", {"train": 0.5, "eval": 0.5})
    splits = {r["doc_id"]: r["split"] for r in s.collect()}
    train = s.where(F.col("split") == "train")
    ev = s.where(F.col("split") == "eval")
    pairs = ngram_jaccard_against(ev, train, threshold=0.9).collect()
    if splits[0] != splits[1]:
        # the near-identical pair crosses the boundary → exactly one leak
        assert len(pairs) == 1
        leaked = {p["new_id"] for p in pairs} | {p["corpus_id"] for p in pairs}
        assert leaked == {0, 1}
    else:
        # both landed on the same side → nothing crosses
        assert pairs == []


def test_mixture_sample_tokens_hits_token_shares(spark):
    """Classes with very different doc lengths: the TOKEN mixture keeps
    the binding class whole and samples the other to its token share —
    where the ROW mixture would miss the token target badly."""
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.sampling import mixture_sample_tokens

    # class a: 1000 docs × 10 tokens = 10_000 tokens
    # class b: 100 docs × 50 tokens = 5_000 tokens
    rows = [(i, "a", "w " * 10) for i in range(1000)] + [
        (i + 10_000, "b", "w " * 50) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, cls string, text string")
    # 50/50 token target: b is binding (5_000 / 0.5 = 10_000 <
    # 10_000 / 0.5 = 20_000), so keep ALL of b and ~half of a's TOKENS
    out = mixture_sample_tokens(
        df, key="doc_id", class_col="cls", text_col="text",
        target_weights={"a": 0.5, "b": 0.5},
    )
    kept = out.groupBy("cls").agg(F.count("*").alias("n")).collect()
    got = {r.cls: r.n for r in kept}
    assert got["b"] == 100                     # binding class fully kept
    # ~500 of a's 1000 docs ≈ 5_000 of its 10_000 tokens
    assert abs(got["a"] - 500) <= 60
    # deterministic
    again = mixture_sample_tokens(
        df, key="doc_id", class_col="cls", text_col="text",
        target_weights={"a": 0.5, "b": 0.5},
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mixture_tokens_vs_rows_divergence(spark):
    """The reason the operator exists: with unequal doc lengths the row
    mixture's kept-token share misses the target; the token mixture's
    lands on it."""
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.sampling import (
        mixture_sample,
        mixture_sample_tokens,
    )
    from scholarmind_spark.operators.textstats import token_count

    rows = [(i, "a", "w " * 2) for i in range(1000)] + [
        (i + 10_000, "b", "w " * 40) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, cls string, text string")
    w = {"a": 0.5, "b": 0.5}

    def token_share(out):
        t = (
            out.groupBy("cls")
            .agg(F.sum(token_count(F.col("text"))).alias("t"))
            .collect()
        )
        tot = {r.cls: r.t for r in t}
        return tot.get("a", 0) / (tot.get("a", 0) + tot.get("b", 0))

    by_rows = token_share(mixture_sample(df, "doc_id", "cls", w))
    by_tokens = token_share(
        mixture_sample_tokens(df, "doc_id", "cls", "text", w)
    )
    # row mixture keeps 1000/1000 docs → token share a = 2/42 ≈ 0.048
    assert by_rows < 0.1
    # token mixture keeps all of a (binding) and ~1/20 of b's docs
    assert abs(by_tokens - 0.5) < 0.1


def test_mixture_upsample_reaches_unreachable_target(spark):
    """The r12 gap made load-bearing: a 70/30 target where the scarce
    class holds only ~9% of the tokens.  Down-sample-only realizes the
    target by discarding ~96% of the abundant class; up-sampling with
    max_epochs=3 instead repeats the scarce class and keeps 3x the
    corpus at the same realized shares."""
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.sampling import (
        mixture_sample_tokens,
        mixture_sample_tokens_upsample,
    )
    from scholarmind_spark.operators.textstats import token_count

    # scarce: 100 docs x 10 tokens = 1_000; abundant: 1000 docs x 10 =
    # 10_000 tokens → scarce natural token share 1/11 ≈ 0.09
    rows = [(i, "scarce", "w " * 10) for i in range(100)] + [
        (i + 10_000, "abundant", "w " * 10) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, cls string, text string")
    w = {"scarce": 0.3, "abundant": 0.7}

    def shares_and_total(out):
        t = (
            out.groupBy("cls")
            .agg(F.sum(token_count(F.col("text"))).alias("t"))
            .collect()
        )
        tot = {r.cls: r.t for r in t}
        s = sum(tot.values())
        return {k: v / s for k, v in tot.items()}, s

    down_sh, down_total = shares_and_total(
        mixture_sample_tokens(df, "doc_id", "cls", "text", w)
    )
    up = mixture_sample_tokens_upsample(
        df, "doc_id", "cls", "text", w, max_epochs=3
    )
    up_sh, up_total = shares_and_total(up)
    # both hit the shares (scarce binds in both derivations)...
    assert abs(down_sh["scarce"] - 0.3) < 0.05
    assert abs(up_sh["scarce"] - 0.3) < 0.05
    # ...but the up-sampled mix serves ~3x the tokens at those shares —
    # the budget a down-sample-only pass cannot reach
    assert up_total > 2.5 * down_total

    # repetition cap honored, binding class repeated exactly 3 epochs
    eps = {r.cls: r.m for r in up.groupBy("cls").agg(
        F.max("epoch").alias("m")).collect()}
    assert eps["scarce"] == 2          # epochs 0,1,2 = 3 full copies
    assert eps["abundant"] <= 2
    # epoch-tagged copies are exact duplicates of the source rows
    dup = (
        up.filter((F.col("cls") == "scarce") & (F.col("epoch") > 0))
        .join(df.filter(F.col("cls") == "scarce"), ["doc_id", "cls", "text"])
    )
    assert dup.count() == 200          # 100 docs x epochs 1,2


def test_mixture_upsample_epoch1_degrades_to_downsample_rates(spark):
    """max_epochs=1: every rate clamps to <= 1 and exactly one epoch-0
    pass survives — same keep-rate derivation as the down-sample twin
    (hash salt differs, so the kept SET may differ; the SIZE per class
    must match within hash noise and no epoch exceeds 0)."""
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.sampling import (
        mixture_sample_tokens,
        mixture_sample_tokens_upsample,
    )

    rows = [(i, "a", "w " * 10) for i in range(1000)] + [
        (i + 10_000, "b", "w " * 50) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, cls string, text string")
    w = {"a": 0.5, "b": 0.5}
    up = mixture_sample_tokens_upsample(
        df, "doc_id", "cls", "text", w, max_epochs=1
    )
    assert up.agg(F.max("epoch")).first()[0] == 0
    down_n = {r.cls: r.n for r in mixture_sample_tokens(
        df, "doc_id", "cls", "text", w
    ).groupBy("cls").agg(F.count("*").alias("n")).collect()}
    up_n = {r.cls: r.n for r in up.groupBy("cls").agg(
        F.count("*").alias("n")).collect()}
    assert up_n["b"] == down_n["b"] == 100      # binding class whole
    assert abs(up_n["a"] - down_n["a"]) <= 60   # same rate, other salt
