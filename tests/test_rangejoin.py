"""Binned range join: tolerance boundaries and bin-edge crossings."""

from datetime import datetime

from scholarmind_spark.operators.rangejoin import range_join_count


def _ts(s):
    return datetime.fromtimestamp(1704067200 + s)


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(0)), (2, "u1", _ts(1000)), (3, "u2", _ts(0)), (4, "u3", _ts(0))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(300)),    # exactly +tolerance of event 1 → counts
            ("u1", _ts(301)),    # 1s beyond → not counted for event 1
            ("u1", _ts(999)),    # within 300 of event 2 (crosses a bin edge)
            ("u2", _ts(-300)),   # exactly -tolerance → counts
            ("u9", _ts(0)),      # other user → never counts
        ],
        "user_id string, pts timestamp",
    )
    out = range_join_count(
        left, right, key="user_id", ts_left="ts", ts_right="pts", tolerance_s=300
    )
    got = {r.event_id: r.n_in_range for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}
    # every left row survives exactly once (no bin-replication duplicates)
    assert out.count() == 4


def test_range_join_duplicate_left_rows_survive(spark):
    """Fully-identical left rows must each produce their own output row —
    grouping back by left columns alone would collapse them."""
    left = spark.createDataFrame(
        [("u1", _ts(0)), ("u1", _ts(0)), ("u1", _ts(0))],
        "user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(100))], "user_id string, pts timestamp"
    )
    out = range_join_count(
        left, right, key="user_id", ts_left="ts", ts_right="pts", tolerance_s=300
    )
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.n_in_range == 1 for r in rows)
