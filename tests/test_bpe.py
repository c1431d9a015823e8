"""Merge-table BPE: trainer determinism, encoder equivalence with the
reference iterative lowest-rank algorithm, engine parity, and the
packing/chunking integration."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from scholarmind_spark.operators.bpe import (
    PINNED_MERGES,
    bpe_token_count,
    bpe_token_count_sql,
    bpe_tokens,
    bpe_tokens_sql,
    bpe_train,
)


def seq_encode(word, merges):
    """The module's semantics in pure Python: sequential rank-order
    application, each merge one leftmost-first non-overlapping pass."""
    toks = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def ref_encode(word, merges):
    """The reference BPE encoder (Sennrich/GPT-2 shape): repeatedly
    merge ALL occurrences of the lowest-rank pair present."""
    ranks = {m: i for i, m in enumerate(merges)}
    toks = list(word)
    while True:
        cand = [
            ranks[(toks[i], toks[i + 1])]
            for i in range(len(toks) - 1)
            if (toks[i], toks[i + 1]) in ranks
        ]
        if not cand:
            return toks
        a, b = merges[min(cand)]
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out


def test_trainer_is_deterministic_and_consistent(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest"), (3, "low new")],
        ["doc_id", "text"],
    )
    m1 = bpe_train(docs, "text", n_merges=10)
    m2 = bpe_train(docs, "text", n_merges=10)
    assert m1 == m2 and len(m1) == 10
    # training-consistency: every merge's operands are single chars or
    # produced by an EARLIER merge
    produced = set()
    for a, b in m1:
        for side in (a, b):
            assert len(side) == 1 or side in produced, (a, b)
        produced.add(a + b)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=24))
def test_sequential_equals_iterative_on_pinned_table(word):
    """For the training-consistent pinned table, the straight-line
    sequential encoder (what the JVM expression chain implements) matches
    the reference iterative lowest-rank encoder."""
    assert seq_encode(word, PINNED_MERGES) == ref_encode(word, PINNED_MERGES)


def test_sequential_equals_iterative_on_freshly_trained_table(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the quick brown fox", "pack my box with five dozen jugs",
             "sphinx of black quartz judge my vow", "the the thee them theme"]
        )],
        ["doc_id", "text"],
    )
    merges = bpe_train(docs, "text", n_merges=30)
    for w in ["the", "theme", "quickest", "boxer", "juggling", "aaaa", "zzzz"]:
        assert seq_encode(w, merges) == ref_encode(w, merges), w


def test_arrow_tier_matches_expression_tier(spark):
    """bpe_tokens_batched (mapInPandas, iterative lowest-rank, memo)
    equals the expression-chain tier row-by-row, including NULL text →
    NULL array and no-word text → empty array."""
    from scholarmind_spark.operators.bpe import bpe_tokens_batched

    rows = [
        (1, "Customers batch SMALL scans, joining columns"),
        (2, ""),
        (3, None),
        (4, "!!! ??? ..."),
        (5, "aaaa lowering lowest merge-table 0042"),
        (6, "the same word the same word the same word"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = (
        bpe_tokens_batched(df)
        .withColumn("expr_toks", bpe_tokens(F.col("text")))
        .collect()
    )
    assert len(got) == len(rows)
    for r in got:
        assert r["bpe_tokens"] == r["expr_toks"], r["doc_id"]


def test_arrow_tier_with_large_trained_table(spark):
    """Tier equality holds for a freshly-trained larger table (the
    tier the expression chain is NOT meant for)."""
    from scholarmind_spark.operators.bpe import bpe_tokens_batched

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs",
             "sphinx of black quartz judge my vow",
             "lowering the lowest merge tables lowers latency"] * 3
        )],
        ["doc_id", "text"],
    )
    merges = bpe_train(docs, "text", n_merges=120)
    got = (
        bpe_tokens_batched(docs, merges=merges, out_col="arrow_toks")
        .withColumn("expr_toks", bpe_tokens(F.col("text"), merges))
        .collect()
    )
    for r in got:
        assert r["arrow_toks"] == r["expr_toks"], r["doc_id"]


def test_arrow_tier_broadcast_memoized(spark):
    """Repeated bpe_tokens_batched calls in one session reuse ONE
    broadcast of the merge table instead of leaking one per call
    (ADVICE r10) — keyed by (applicationId, merge table), verified by
    object identity; a different table gets its own entry."""
    from scholarmind_spark.operators import bpe as bpe_mod
    from scholarmind_spark.operators.bpe import bpe_tokens_batched

    df = spark.createDataFrame([("low lower",)], "text string")
    bpe_mod._BCAST_CACHE.clear()
    r1 = bpe_tokens_batched(df).collect()
    assert len(bpe_mod._BCAST_CACHE) == 1
    b_first = next(iter(bpe_mod._BCAST_CACHE.values()))[1]
    r2 = bpe_tokens_batched(df).collect()
    assert len(bpe_mod._BCAST_CACHE) == 1
    assert next(iter(bpe_mod._BCAST_CACHE.values()))[1] is b_first
    assert [r.bpe_tokens for r in r1] == [r.bpe_tokens for r in r2]

    # a different merge table is a different cache entry, same app
    bpe_tokens_batched(df, merges=[("l", "o")]).collect()
    assert len(bpe_mod._BCAST_CACHE) == 2


def test_run_handling_leftmost_nonoverlap():
    # '<a><a><a><a>' must become '<aa><aa>', '<a><a><a>' → '<aa><a>'
    m = [("a", "a")]
    assert seq_encode("aaaa", m) == ["aa", "aa"]
    assert seq_encode("aaa", m) == ["aa", "a"]
    assert ref_encode("aaaa", m) == ["aa", "aa"]


def test_spark_matches_python_and_duckdb(spark):
    rows = [
        (1, "Customer JOIN filter!"),
        (2, "small batch scan scan"),
        (3, ""),
        (4, None),
        (5, "zzz qqq join123join"),
        (6, "aaaa lowlow parpar"),
        (7, "  multiple   spaces\tand\nnewlines  "),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["toks"], r["n"])
        for r in df.select(
            "doc_id",
            bpe_tokens(F.col("text")).alias("toks"),
            bpe_token_count(F.col("text")).alias("n"),
        ).collect()
    }
    import re

    for i, t in rows:
        if t is None:
            assert got[i] == (None, 0)
            continue
        words = re.findall("[a-z0-9]+", t.lower())
        expect = [p for w in words for p in seq_encode(w, PINNED_MERGES)]
        assert got[i] == (expect, len(expect)), i

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    orows = con.execute(
        f"SELECT doc_id, {bpe_tokens_sql('text')}, {bpe_token_count_sql('text')} "
        "FROM t ORDER BY doc_id"
    ).fetchall()
    for i, toks, n in orows:
        assert got[i] == (toks, n), i


def test_packing_boundaries_with_both_tokenizers(spark):
    """The VERDICT-r8 ask: pack_sequences boundary arithmetic holds
    under the BPE counter exactly as under the whitespace counter, and
    the SQL twin agrees for both."""
    from scholarmind_spark.operators.packing import (
        pack_sequences,
        pack_sequences_sql,
    )

    rows = [(i, "customer join " * (i + 1)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?)", rows)

    for counter, counter_sql in [
        (None, None),
        (bpe_token_count, bpe_token_count_sql),
    ]:
        packed = pack_sequences(
            df, context_tokens=7, shards=2, token_counter=counter
        )
        got = sorted(tuple(r) for r in packed.collect())
        oracle = sorted(
            con.execute(
                pack_sequences_sql(
                    "docs", context_tokens=7, shards=2,
                    token_counter_sql=counter_sql,
                )
            ).fetchall()
        )
        assert got == oracle
        # boundary invariants, tokenizer-agnostic
        for (_id, _sh, n_tok, start, first, last, off) in got:
            assert first == start // 7 and off == start % 7
            assert last == max(first, (start + n_tok - 1) // 7)


def test_chunking_with_bpe_tokenizer(spark):
    from scholarmind_spark.operators.chunking import (
        chunk_documents,
        chunk_documents_sql,
    )

    rows = [(1, "customer join filter small batch scan"), (2, "low lower")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_documents(
        df, chunk_tokens=4, overlap=1, tokenizer=bpe_tokens
    )
    got = sorted(tuple(r) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?,?)", rows)
    oracle = sorted(
        con.execute(
            chunk_documents_sql(
                "docs", chunk_tokens=4, overlap=1, tokenizer_sql=bpe_tokens_sql
            )
        ).fetchall()
    )
    assert got == oracle
    # every non-final chunk holds exactly chunk_tokens BPE pieces
    by_id = {}
    for (i, cid, n, _txt) in got:
        by_id.setdefault(i, []).append((cid, n))
    for chunks in by_id.values():
        chunks.sort()
        assert all(n == 4 for _cid, n in chunks[:-1])


def test_merge_broadcast_lru_cap_and_collision_unpersist():
    """_BCAST_CACHE is LRU-capped per application and releases
    displaced broadcasts: many distinct merge tables in one session
    must not pin one never-unpersisted broadcast each (r12 advice),
    and a hash-collision fallthrough must unpersist the prior
    broadcast before overwriting its slot."""
    from scholarmind_spark.operators import bpe as bpe_mod

    class _FakeBcast:
        def __init__(self, v):
            self.value = v
            self.unpersisted = False

        def unpersist(self):
            self.unpersisted = True

    class _FakeSC:
        applicationId = "app-lru-test"

        def broadcast(self, v):
            return _FakeBcast(v)

    sc = _FakeSC()
    saved = dict(bpe_mod._BCAST_CACHE)
    bpe_mod._BCAST_CACHE.clear()
    try:
        tables = [[("a", f"t{i}")] for i in range(bpe_mod._BCAST_CAP + 3)]
        bcasts = [bpe_mod._merge_broadcast(sc, {}, m) for m in tables]
        live = [k for k in bpe_mod._BCAST_CACHE if k[0] == sc.applicationId]
        assert len(live) == bpe_mod._BCAST_CAP
        # the 3 oldest were evicted AND unpersisted; the newest cap
        # survive and a repeat call is a cache hit on the same object
        assert all(b.unpersisted for b in bcasts[:3])
        assert not any(b.unpersisted for b in bcasts[3:])
        assert bpe_mod._merge_broadcast(sc, {}, tables[-1]) is bcasts[-1]

        # collision fallthrough: same cache key, different table — the
        # displaced broadcast must be unpersisted, not silently dropped
        key = (sc.applicationId, hash(tuple(tables[-1])))
        poisoned = _FakeBcast("other")
        bpe_mod._BCAST_CACHE[key] = ([("x", "y")], poisoned)
        fresh = bpe_mod._merge_broadcast(sc, {}, tables[-1])
        assert poisoned.unpersisted
        assert bpe_mod._BCAST_CACHE[key][1] is fresh
    finally:
        bpe_mod._BCAST_CACHE.clear()
        bpe_mod._BCAST_CACHE.update(saved)
