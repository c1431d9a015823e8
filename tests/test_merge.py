"""Incremental merge (upsert) semantics."""

from __future__ import annotations

from scholarmind_spark.operators.merge import merge_upsert


def test_merge_upsert_update_insert_survive(spark):
    snap = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], ["id", "val", "version"]
    )
    upd = spark.createDataFrame(
        [(2, "B", 2), (3, "C", 2)], ["id", "val", "version"]
    )
    got = {
        r.id: (r.val, r.version)
        for r in merge_upsert(snap, upd, "id", version_col="version").collect()
    }
    assert got == {1: ("a", 1), 2: ("B", 2), 3: ("C", 2)}


def test_merge_upsert_update_wins_version_tie(spark):
    snap = spark.createDataFrame([(4, "old", 5)], ["id", "val", "version"])
    upd = spark.createDataFrame([(4, "new", 5)], ["id", "val", "version"])
    rows = merge_upsert(snap, upd, "id", version_col="version").collect()
    assert [(r.id, r.val, r.version) for r in rows] == [(4, "new", 5)]


def test_merge_upsert_snapshot_newer_version_survives(spark):
    # out-of-order increment: the snapshot already holds a NEWER version
    snap = spark.createDataFrame([(7, "v3", 3)], ["id", "val", "version"])
    upd = spark.createDataFrame([(7, "v2", 2)], ["id", "val", "version"])
    rows = merge_upsert(snap, upd, "id", version_col="version").collect()
    assert [(r.id, r.val, r.version) for r in rows] == [(7, "v3", 3)]


def test_merge_upsert_no_version_col(spark):
    snap = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    upd = spark.createDataFrame([(2, "B")], ["id", "val"])
    got = {r.id: r.val for r in merge_upsert(snap, upd, "id").collect()}
    assert got == {1: "a", 2: "B"}
