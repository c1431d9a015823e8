"""As-of join: semantics (ties, no-prior-match, multi-value carry) and the
scale-critical plan shape — exactly ONE shuffle, no Python stages."""

import datetime as dt

from pyspark.sql import functions as F

from scholarmind_spark.operators.asof import asof_join
from scholarmind_spark.plans import plan_digest


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", dt.datetime(2026, 1, 1, 10)),
            (2, "u1", dt.datetime(2026, 1, 1, 12)),
            (3, "u2", dt.datetime(2026, 1, 1, 9)),   # predates every right row
            (4, "u3", dt.datetime(2026, 1, 1, 9)),   # key absent on right
        ],
        "event_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", dt.datetime(2026, 1, 1, 10), 5.0),  # tie with event 1
            ("u1", dt.datetime(2026, 1, 1, 11), 7.0),
            ("u2", dt.datetime(2026, 1, 1, 10), 9.0),
        ],
        "user_id string, ts timestamp, v double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, key="user_id", ts="ts")
    rows = {r.event_id: (r.asof_ts, r.v) for r in out.collect()}
    # tie at equal ts matches (>= semantics, right sorts before left)
    assert rows[1] == (dt.datetime(2026, 1, 1, 10), 5.0)
    # latest prior, not first
    assert rows[2] == (dt.datetime(2026, 1, 1, 11), 7.0)
    # left rows with no prior right row survive with nulls (left join)
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)
    assert out.count() == left.count()


def test_asof_matched_row_nulls_carry_together(spark):
    """A NULL in the matched right row must surface as NULL — not be
    replaced by an older row's non-NULL value (SQL ASOF returns the
    matched row as-is, NULLs included)."""
    left = spark.createDataFrame(
        [(1, "u1", dt.datetime(2026, 1, 1, 12))],
        "event_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", dt.datetime(2026, 1, 1, 10), 5.0, "a"),
            ("u1", dt.datetime(2026, 1, 1, 11), None, "b"),  # matched row: v is NULL
        ],
        "user_id string, ts timestamp, v double, tag string",
    )
    out = asof_join(left, right, key="user_id", ts="ts")
    r = out.collect()[0]
    assert r.asof_ts == dt.datetime(2026, 1, 1, 11)
    assert r.v is None and r.tag == "b"


def test_asof_plan_single_shuffle(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, key="user_id", ts="ts")
    d = plan_digest(out)
    # union + one window over the key: one Exchange, no join node, JVM-only
    assert d["exchanges"] == 1, d
    assert d["joins"] == [], d
    assert d["python_stages"] == 0, d
