from __future__ import annotations

import duckdb
import pytest

from scholarmind_spark.operators.graph import (
    MICRO,
    cooccurrence_edges,
    cooccurrence_edges_sql,
    pagerank,
    pagerank_sql,
)


def _ranks(spark, edges, **kw):
    from scholarmind_spark.util import release_caches

    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    out = pagerank(df, **kw)
    rows = {r["node"]: r["rank_micro"] for r in out.collect()}
    release_caches(out)
    return rows


def test_two_node_cycle_is_symmetric(spark):
    r = _ranks(spark, [("a", "b", 1), ("b", "a", 1)])
    assert r["a"] == r["b"]
    # teleport + full damped mass back: fixed point stays at MICRO
    assert abs(r["a"] - MICRO) <= 5


def test_star_center_outranks_leaves(spark):
    edges = [(leaf, "hub", 1) for leaf in ("a", "b", "c", "d")] + [
        ("hub", leaf, 1) for leaf in ("a", "b", "c", "d")
    ]
    r = _ranks(spark, edges)
    assert r["hub"] > max(r[leaf] for leaf in ("a", "b", "c", "d"))


def test_dangling_mass_redistributes(spark):
    # b has no out-edges: its damped mass must not vanish — total mass
    # stays within integer-floor slack of V * MICRO.
    r = _ranks(spark, [("a", "b", 1), ("c", "b", 2)])
    total = sum(r.values())
    assert 3 * MICRO - 100 <= total <= 3 * MICRO


def test_weighted_edges_split_proportionally(spark):
    # a sends 3/4 of its damped mass to b, 1/4 to c.
    r = _ranks(spark, [("a", "b", 3), ("a", "c", 1)], iterations=1)
    contrib_b = r["b"] - r["a"]  # a receives only teleport+share, as do all
    contrib_c = r["c"] - r["a"]
    assert contrib_b == 3 * contrib_c or abs(contrib_b - 3 * contrib_c) <= 3


def test_matches_duckdb_oracle_on_documents(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "x y z x y"), (2, "y x"), (3, "z z q"), (4, None)],
        ["doc_id", "text"],
    )
    p = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.parquet(p)
    from scholarmind_spark.util import release_caches

    out = pagerank(cooccurrence_edges(docs), iterations=4)
    got = {(r["node"], r["rank_micro"]) for r in out.collect()}
    release_caches(out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    want = set(
        con.sql(
            pagerank_sql(cooccurrence_edges_sql("documents"), iterations=4)
        ).fetchall()
    )
    assert got == want


def test_pagerank_plan_stays_flat(spark):
    # lineage is truncated every round: the final plan must not embed
    # one join tree per iteration (the cluster.py OOM class).
    from scholarmind_spark.util import release_caches

    df = spark.createDataFrame([("a", "b", 1), ("b", "a", 1)], ["src", "dst", "weight"])
    out = pagerank(df, iterations=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    release_caches(out)
    assert plan.count("Join") <= 2


def test_pagerank_releases_all_blocks(spark):
    # loop working set freed internally; the attached final checkpoint
    # freed by release_caches — nothing may leak into getPersistentRDDs
    from scholarmind_spark.util import release_caches

    spark.catalog.clearCache()
    base = spark.sparkContext._jsc.getPersistentRDDs().size()
    df = spark.createDataFrame([("a", "b", 1), ("b", "a", 1)], ["src", "dst", "weight"])
    out = pagerank(df, iterations=3)
    out.collect()
    release_caches(out)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == base


def test_pagerank_zero_iterations_returns_uniform(spark):
    """iterations=0 must return the uniform initial ranks — the plan reads
    the nodes checkpoint, which used to be unpersisted before the caller
    could collect (r6 review finding: 'Checkpoint block not found')."""
    from scholarmind_spark.operators.graph import pagerank
    from scholarmind_spark.util import release_caches

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, 1)], "src long, dst long, weight long"
    )
    out = pagerank(edges, iterations=0)
    got = {r["node"]: r["rank_micro"] for r in out.collect()}
    assert got == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}
    release_caches(out)


# ------------------------------------------------------- triangle census

def _tri(spark, pairs):
    from scholarmind_spark.operators.graph import triangle_stats
    from scholarmind_spark.util import release_caches

    df = spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], ["src", "dst", "weight"]
    )
    out = triangle_stats(df)
    row = out.collect()[0].asDict()
    release_caches(out)
    return row


def test_triangle_with_pendant(spark):
    # a-b-c triangle plus pendant c-d: wedges = 1+1+3+0 = 5, coeff 3/5
    r = _tri(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    assert r == {
        "n_nodes": 4,
        "n_edges": 4,
        "n_wedges": 5,
        "n_triangles": 1,
        "clustering_coeff": 0.6,
    }


def test_complete_k4(spark):
    import itertools

    nodes = ["a", "b", "c", "d"]
    r = _tri(spark, list(itertools.combinations(nodes, 2)))
    assert r["n_triangles"] == 4
    assert r["n_wedges"] == 12
    assert r["clustering_coeff"] == 1.0


def test_reversed_duplicate_and_self_edges_collapse(spark):
    # the underlying simple graph is a single triangle regardless of
    # direction, multiplicity, or self-loops in the input
    pairs = [
        ("a", "b"), ("b", "a"), ("a", "b"),
        ("b", "c"), ("c", "a"), ("a", "a"),
    ]
    r = _tri(spark, pairs)
    assert r["n_edges"] == 3
    assert r["n_triangles"] == 1


def test_triangle_free_graph(spark):
    # 4-cycle: wedges but no triangles; coefficient 0, not NULL
    r = _tri(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    assert r["n_triangles"] == 0
    assert r["clustering_coeff"] == 0.0


def test_census_matches_bruteforce(spark):
    # deterministic pseudo-random graph on 14 nodes
    import itertools

    nodes = [f"n{i}" for i in range(14)]
    pairs = [
        (a, b)
        for i, a in enumerate(nodes)
        for j, b in enumerate(nodes)
        if i < j and (i * 31 + j * 17) % 5 < 2
    ]
    adj = set(pairs)
    expect = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if ((a, b) in adj) and ((b, c) in adj) and ((a, c) in adj)
    )
    r = _tri(spark, pairs)
    assert r["n_triangles"] == expect


def test_triangle_duckdb_twin(spark):
    import duckdb

    from scholarmind_spark.operators.graph import triangle_stats_sql

    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"),
        ("c", "e"), ("b", "e"), ("e", "a"),
    ]
    srow = _tri(spark, pairs)
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", pairs)
    orow = (
        con.execute(triangle_stats_sql("SELECT src, dst FROM e"))
        .df()
        .iloc[0]
        .to_dict()
    )
    assert srow["n_triangles"] == orow["n_triangles"]
    assert srow["n_wedges"] == orow["n_wedges"]
    assert srow["clustering_coeff"] == orow["clustering_coeff"]
