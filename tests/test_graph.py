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
