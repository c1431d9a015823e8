"""Feature-hashing featurizer (operators/features)."""

from __future__ import annotations

import math

from scholarmind_spark.operators.features import hash_features


def test_hash_features_l2_normalized_and_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "delta delta")],
        "doc_id long, text string",
    )
    rows = hash_features(df, dim=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # per-doc L2 norm of values ~ 1 (rounded components)
    for doc, rs in by_doc.items():
        norm = math.sqrt(sum(r.value**2 for r in rs))
        assert abs(norm - 1.0) < 1e-4, (doc, norm)
    # tf magnitudes: doc 2 is one token twice -> single bucket, |tf|=2, |value|=1
    assert len(by_doc[2]) == 1
    assert abs(by_doc[2][0].tf_signed) == 2
    assert abs(by_doc[2][0].value) == 1.0
    # determinism
    again = hash_features(df, dim=16).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hash_features_same_token_same_bucket_across_docs(spark):
    df = spark.createDataFrame(
        [(1, "shared unique1"), (2, "shared unique2")], "doc_id long, text string"
    )
    rows = hash_features(df, dim=8).collect()
    # the shared token lands in the same (bucket, sign) for both docs
    # (find buckets present in both docs with equal signed direction)
    d1 = {(r.bucket, r.tf_signed > 0) for r in rows if r.doc_id == 1}
    d2 = {(r.bucket, r.tf_signed > 0) for r in rows if r.doc_id == 2}
    assert d1 & d2


def test_regex_dialect_parity_vtab_crlf_and_zh(spark):
    """The r6 dialect sweep: Java \\s includes \\x0B while RE2's does not,
    Java '.' excludes \\r while RE2's excludes only \\n, and zh lang-id
    needs Han chars (whitespace tokens never match Chinese stopwords).
    Each pair must now agree on the same strings."""
    import duckdb

    from scholarmind_spark.operators.textstats import (
        char_entropy,
        char_entropy_sql,
        lang_id,
        lang_id_sql,
        token_count,
        token_count_sql,
    )
    from pyspark.sql import functions as F

    rows = [(1, "a\x0bb"), (2, "a\r\nb"), (3, "这是一个中文句子的例子"),
            (4, "the cat is on the mat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_tok = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", token_count(F.col("text")).alias("n")).collect()}
    got_lang = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    got_ent = {r["doc_id"]: (r["n_chars"], r["entropy_micro"])
               for r in char_entropy(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want_tok = dict(con.execute(
        f"SELECT doc_id, {token_count_sql('text')} FROM t").fetchall())
    want_lang = dict(con.execute(
        f"SELECT doc_id, {lang_id_sql('text')} FROM t").fetchall())
    want_ent = {k: (n, e) for k, n, e in con.execute(
        "SELECT doc_id, n_chars, entropy_micro FROM ("
        + char_entropy_sql("t") + ")").fetchall()}

    assert got_tok == want_tok and got_tok[1] == 2  # \x0B splits like Java \s
    assert got_ent == want_ent  # CRLF text: same n_chars both engines
    assert got_lang == want_lang
    assert got_lang[3] == "zh" and got_lang[4] == "en"  # zh no longer dead
