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


def test_scd2_history_suppresses_and_closes(spark):
    from scholarmind_spark.operators.merge import scd2_history

    rows = [
        # key 1: A -> A (suppressed) -> B -> A
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "A"),
        # key 2: single version stays open
        (2, 15, "X"),
    ]
    df = spark.createDataFrame(rows, "k long, ts long, status string")
    out = scd2_history(df, key="k", ts_col="ts", attr_cols=["status"]).collect()
    got = {(r.k, r.valid_from): (r.status, r.valid_to, r.is_current) for r in out}
    assert got == {
        (1, 10): ("A", 30, False),
        (1, 30): ("B", 40, False),
        (1, 40): ("A", None, True),
        (2, 15): ("X", None, True),
    }


def test_scd2_history_null_attr_change_detected(spark):
    from scholarmind_spark.operators.merge import scd2_history

    rows = [(1, 10, None), (1, 20, None), (1, 30, "A"), (1, 40, None)]
    df = spark.createDataFrame(rows, "k long, ts long, status string")
    out = scd2_history(df, key="k", ts_col="ts", attr_cols=["status"]).collect()
    # null->null suppressed; null->A and A->null are real changes
    assert sorted((r.valid_from, r.status) for r in out) == [
        (10, None), (30, "A"), (40, None),
    ]
