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


def test_merge_upsert_duplicate_updates_tiebreak(spark):
    """Two update rows for one key with equal version: without a tiebreak
    the winner follows physical row order; with one it is deterministic
    (r6 review finding — the MERGE precondition, made enforceable)."""
    from scholarmind_spark.operators.merge import merge_upsert

    snap = spark.createDataFrame([(1, "old", 1, "z")],
                                 "k long, v string, ver long, src string")
    ups = spark.createDataFrame(
        [(1, "dup-b", 5, "b"), (1, "dup-a", 5, "a")],
        "k long, v string, ver long, src string",
    )
    for _ in range(3):  # stable across retries/replans
        out = merge_upsert(snap, ups.repartition(7), "k",
                           version_col="ver", tiebreak="src").collect()
        assert len(out) == 1 and out[0]["v"] == "dup-a"  # lowest src wins


def test_scd2_null_ts_cross_engine_parity(spark):
    """NULL ts ordering: Spark ASC is NULLS FIRST, DuckDB default is NULLS
    LAST, and lag-IS-NULL misfires after a null-ts row — the twin must pin
    both (r6 review finding)."""
    import duckdb

    from scholarmind_spark.operators.merge import scd2_history, scd2_history_sql

    rows = [
        (1, None, "a"),
        (1, "2024-01-02 00:00:00", "a"),  # unchanged after null-ts row
        (1, "2024-01-03 00:00:00", "b"),
        (2, "2024-01-01 00:00:00", "x"),
    ]
    df = spark.createDataFrame(rows, "k long, ts string, attr string").selectExpr(
        "k", "CAST(ts AS timestamp) AS ts", "attr"
    )
    got = sorted(
        (r["k"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"], r["attr"])
        for r in scd2_history(df, "k", "ts", ["attr"]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE feed_src (k BIGINT, ts TIMESTAMP, attr VARCHAR)")
    con.executemany("INSERT INTO feed_src VALUES (?, ?, ?)", rows)
    want = sorted(
        (k, str(vf), str(vt), cur, attr)
        for k, attr, vf, vt, cur in con.execute(
            scd2_history_sql("SELECT * FROM feed_src", "k", "ts", ["attr"])
        ).fetchall()
    )
    assert got == want
    # the unchanged row after the null-ts row is suppressed on BOTH engines
    assert len([r for r in got if r[0] == 1]) == 2
