"""Sketch-state ledger: keyed fold exactness (fold == direct) for HDR /
KMV / Bloom state, the state-only drift answer, and DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from scholarmind_spark.operators.sketchledger import (
    bloom_state_build,
    bloom_state_merge,
    hdr_state_build,
    hdr_state_build_sql,
    hdr_state_drift,
    hdr_state_drift_sql,
    hdr_state_merge,
    hdr_state_quantiles,
    kmv_state_build,
    kmv_state_estimate,
    kmv_state_merge,
)

KEYS = ["day", "seg"]


def _rows():
    # two days, two segments, one NULL segment; negative / zero / NaN /
    # NULL / inf values exercise every branch of the bucket math
    out = []
    for day in ("19000", "19001"):
        for seg in ("api", "web", None):
            for i in range(30):
                out.append((day, seg, float(i * 7 - 40), i % 11, i % 2))
    out.append(("19000", "api", float("nan"), 1, 0))
    out.append(("19001", "web", None, 2, 1))
    out.append(("19001", "web", float("inf"), 3, 0))
    return out


SCHEMA = "day string, seg string, v double, u int, g int"


def _frames(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    return df, df.where(F.col("g") == 0), df.where(F.col("g") == 1)


def _sorted(rows):
    vals = rows.collect() if hasattr(rows, "collect") else rows
    return sorted(
        (tuple(r) for r in vals),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_hdr_state_fold_equals_direct(spark):
    df, b1, b2 = _frames(spark)
    folded = hdr_state_merge(
        hdr_state_build(b1, KEYS, "v"), hdr_state_build(b2, KEYS, "v")
    )
    direct = hdr_state_build(df, KEYS, "v")
    assert _sorted(folded) == _sorted(direct)
    # NULL segment is its own group; non-finite values never entered
    cells = folded.collect()
    assert any(r["seg"] is None for r in cells)


def test_hdr_state_quantiles_bounded_and_keyed(spark):
    df, _, _ = _frames(spark)
    state = hdr_state_build(df, KEYS, "v")
    q = hdr_state_quantiles(state, KEYS, (500, 990)).collect()
    # every (day, seg) key answers every quantile
    assert len(q) == 2 * 3 * 2
    for r in q:
        assert r["n_rows"] == 30
        # p=5 → ≤ 3.2% relative error on the milli-quantized magnitude
        assert r["est_milli"] is not None


def test_kmv_state_fold_equals_direct_and_exact_below_k(spark):
    df, b1, b2 = _frames(spark)
    k = 8  # u has 11 distinct values per key → estimation regime
    folded = kmv_state_merge(
        kmv_state_build(b1, KEYS, "u", k), kmv_state_build(b2, KEYS, "u", k), k
    )
    direct = kmv_state_build(df, KEYS, "u", k)
    assert _sorted(folded) == _sorted(direct)
    # exact below k: k=64 holds all 11 distinct u values per key
    est = kmv_state_estimate(kmv_state_build(df, KEYS, "u", 64), 64).collect()
    for r in est:
        assert r["est_distinct"] == r["n_minima"] <= 11


def test_bloom_state_fold_equals_direct_never_false_negative(spark):
    df, b1, b2 = _frames(spark)
    folded = bloom_state_merge(
        bloom_state_build(b1, KEYS, "u", 16, 4),
        bloom_state_build(b2, KEYS, "u", 16, 4),
    )
    direct = bloom_state_build(df, KEYS, "u", 16, 4)
    assert _sorted(folded) == _sorted(direct)
    # never-false-negative per key: every (key, u) that was inserted
    # probes all-set against that key's words
    from scholarmind_spark.operators.bloom import bloom_contains

    one_key = folded.where(
        (F.col("day") == "19000") & (F.col("seg") == "api")
    ).select("word", "bits")
    inserted = df.where(
        (F.col("day") == "19000") & (F.col("seg") == "api")
    ).select(F.col("u").cast("string").alias("u"))
    got = bloom_contains(one_key, inserted, "u", 16, 4).collect()
    assert got and all(r["contained"] == 1 for r in got)


def test_hdr_state_drift_matches_duckdb_twin(spark):
    df, b1, b2 = _frames(spark)
    folded = hdr_state_merge(
        hdr_state_build(b1, KEYS, "v"), hdr_state_build(b2, KEYS, "v")
    )
    got = _sorted(hdr_state_drift(folded, "seg", "day", 990))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (day VARCHAR, seg VARCHAR, v DOUBLE, u INT, g INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", _rows())
    state = hdr_state_build_sql("SELECT day, seg, v FROM t", KEYS)
    oracle = _sorted(
        con.execute(
            "SELECT * FROM " + hdr_state_drift_sql(state, "seg", "day", 990)
        ).fetchall()
    )
    assert got == oracle
    # drift rows exist only for day 19001 (19000 has no predecessor)
    assert got and all(r[1] == "19001" for r in got)


def test_hdr_state_rekey_equals_direct_coarse_build(spark):
    """Rolling up (day, seg) state to day equals building per-day
    directly — additivity, the property that lets one stored grain
    answer every coarser one."""
    from scholarmind_spark.operators.sketchledger import hdr_state_rekey

    df, b1, b2 = _frames(spark)
    folded = hdr_state_merge(
        hdr_state_build(b1, KEYS, "v"), hdr_state_build(b2, KEYS, "v")
    )
    rolled = hdr_state_rekey(folded, ["day"])
    direct = hdr_state_build(df, ["day"], "v")
    assert _sorted(rolled) == _sorted(direct)


def test_bloom_state_rekey_contains_never_false_negative(spark):
    """Folding daily filters into a period filter via bit_or, every
    (segment, user) actually ingested on ANY day probes contained=1;
    the rekeyed state equals a direct segment-level build; and the
    contains answer matches the DuckDB twin byte for byte."""
    from scholarmind_spark.operators.sketchledger import (
        bloom_state_contains,
        bloom_state_contains_sql,
        bloom_state_rekey,
        bloom_state_rekey_sql,
        bloom_state_build_sql,
    )

    df, b1, b2 = _frames(spark)
    state = bloom_state_merge(
        bloom_state_build(b1, KEYS, "u", 16, 4),
        bloom_state_build(b2, KEYS, "u", 16, 4),
    )
    period = bloom_state_rekey(state, ["seg"])
    direct = bloom_state_build(df, ["seg"], "u", 16, 4)
    assert _sorted(period) == _sorted(direct)
    probes = spark.createDataFrame(
        [(str(i),) for i in range(11)] + [("absent-user",)], "v string"
    )
    got_rows = bloom_state_contains(period, probes, "v", 16, 4).collect()
    got = {(r["seg"], r["key"]): r["contained"] for r in got_rows}
    # never-false-negative: every ingested (seg, u) answers 1
    seen = {
        (r["seg"], str(r["u"]))
        for r in df.where(F.col("u").isNotNull()).collect()
    }
    for sk in seen:
        assert got[sk] == 1, sk
    # twin parity (false positives included)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (day VARCHAR, seg VARCHAR, v DOUBLE, u INT, g INT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", _rows())
    per_sql = bloom_state_rekey_sql(
        bloom_state_build_sql("SELECT day, seg, u AS v FROM t", KEYS, 16, 4),
        ["seg"],
    )
    vals = ", ".join(f"('{i}')" for i in range(11)) + ", ('absent-user')"
    oracle = _sorted(
        con.execute(
            "SELECT * FROM "
            + bloom_state_contains_sql(
                per_sql, ["seg"], f"SELECT v FROM (VALUES {vals}) t2(v)", 16, 4
            )
        ).fetchall()
    )
    assert _sorted(got_rows) == oracle


def test_hdr_state_drift_orders_days_numerically_across_digit_boundary(spark):
    """Day keys are strings in state; unpadded integer keys crossing a
    digit-length boundary ('9999' → '10000') must still pair each day
    with its true predecessor (length-then-lex order), on both
    engines."""
    rows = [
        (day, "api", float(v))
        for day, vals in (
            ("9999", range(10)),          # p99 ≈ 9
            ("10000", range(100, 110)),   # p99 ≈ 109
        )
        for v in vals
    ]
    df = spark.createDataFrame(rows, "day string, seg string, v double")
    state = hdr_state_build(df, KEYS, "v")
    got = hdr_state_drift(state, "seg", "day", 990).collect()
    # exactly one drift row: day 10000 vs predecessor 9999, positive
    assert len(got) == 1
    r = got[0]
    assert r["day"] == "10000" and r["drift_milli"] > 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t2 (day VARCHAR, seg VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t2 VALUES (?,?,?)", rows)
    from scholarmind_spark.operators.sketchledger import (
        hdr_state_build_sql,
        hdr_state_drift_sql,
    )

    oracle = con.execute(
        "SELECT * FROM "
        + hdr_state_drift_sql(
            hdr_state_build_sql("SELECT day, seg, v FROM t2", KEYS),
            "seg",
            "day",
            990,
        )
    ).fetchall()
    assert _sorted(got) == _sorted(oracle)


def test_kmv_state_validation(spark):
    df, _, _ = _frames(spark)
    with pytest.raises(ValueError):
        kmv_state_build(df, KEYS, "u", 1)
    with pytest.raises(ValueError):
        kmv_state_merge(df.select("day", "seg"), df.select("day", "seg"), 1)


def test_kmv_state_estimate_detects_geometry_mismatch(spark):
    """k is part of the stored-state contract (ADVICE r10): estimating
    with a SMALLER k than the state was built under means some key
    holds more than k minima — kth_hash is not the k-th minimum and
    the estimate would be silently wrong.  The estimator must fail
    loudly; the matching k still works."""
    df, _, _ = _frames(spark)
    state = kmv_state_build(df, KEYS, "u", 8)
    # matching k: fine (11 distinct u values per key > 8 → cap binds)
    ok = kmv_state_estimate(state, 8).collect()
    assert all(r.n_minima <= 8 for r in ok)
    # smaller k than build-time: a key holds more than k minima → raise
    with pytest.raises(Exception, match="kmv_state_estimate"):
        kmv_state_estimate(state, 4).collect()


def test_sketch_state_compact_equals_direct_mixed_grain(spark):
    """Retention/compaction: days >= cutoff keep day grain, older days
    rekey to the 'm'||(day div 30) period via each family's exact rekey
    fold — the compacted state must equal a DIRECT mixed-grain build
    from raw rows, for all three families (HDR sum, KMV rank-cap,
    Bloom bit_or)."""
    from scholarmind_spark.operators.sketchledger import (
        bloom_state_compact,
        hdr_state_compact,
        kmv_state_compact,
    )

    rows = []
    # days straddling a period boundary: 29/30 are periods m0/m1,
    # 19001 is period m633; cutoff 19001 keeps only that day
    for day in ("29", "30", "19001"):
        for seg in ("api", None):
            for i in range(25):
                rows.append((day, seg, float(i * 3 - 20), i % 9))
    df = spark.createDataFrame(rows, "day string, seg string, v double, u int")
    cutoff = "19001"
    grain = F.when(
        (F.length("day") > len(cutoff))
        | ((F.length("day") == len(cutoff)) & (F.col("day") >= cutoff)),
        F.col("day"),
    ).otherwise(F.concat(F.lit("m"), F.expr("cast(cast(day as bigint) div 30 as string)")))
    mixed = df.withColumn("day", grain)

    got = hdr_state_compact(hdr_state_build(df, KEYS, "v"), "day", cutoff)
    want = hdr_state_build(mixed, KEYS, "v")
    assert _sorted(got.collect()) == _sorted(want.collect())
    days = {r.day for r in got.select("day").distinct().collect()}
    assert days == {"19001", "m0", "m1"}  # old days coarsened, not kept

    got_k = kmv_state_compact(kmv_state_build(df, KEYS, "u", 8), "day", cutoff, 8)
    want_k = kmv_state_build(mixed, KEYS, "u", 8)
    assert _sorted(got_k.collect()) == _sorted(want_k.collect())

    got_b = bloom_state_compact(
        bloom_state_build(df, KEYS, "u", 16, 4), "day", cutoff
    )
    want_b = bloom_state_build(mixed, KEYS, "u", 16, 4)
    assert _sorted(got_b.collect()) == _sorted(want_b.collect())


def test_sketch_state_expire_and_null_day_routing(spark):
    """sketch_state_expire is a pure (length, value)-ordered filter;
    a NULL day key routes to the compactor's EXPIRED branch (its period
    label is NULL — still a real group) instead of being dropped by a
    NULL predicate."""
    from scholarmind_spark.operators.sketchledger import (
        hdr_state_compact,
        sketch_state_expire,
    )

    rows = [(d, "api", 1.0) for d in ("999", "1000", None)]
    df = spark.createDataFrame(rows, "day string, seg string, v double")
    state = hdr_state_build(df, KEYS, "v")
    # numeric order: 999 < 1000 even though '999' > '1000' lexically
    kept = sketch_state_expire(state, "day", "1000")
    assert {r.day for r in kept.select("day").distinct().collect()} == {"1000"}

    compacted = hdr_state_compact(state, "day", "1000")
    days = {r.day for r in compacted.select("day").distinct().collect()}
    assert days == {"1000", "m33", None}  # 999→m33; NULL preserved
    assert compacted.agg(F.sum("cnt")).first()[0] == state.agg(F.sum("cnt")).first()[0]


def test_sketch_state_compact_is_rerunnable(spark):
    """A standing ledger is compacted on every fold, so compaction must
    be idempotent over its own output: existing period rows keep their
    label (no crash on the 'm…' cast, no leaking into the retained
    branch via the (length, value) compare), and advancing the cutoff
    moves newly-expired days into their periods exactly."""
    from scholarmind_spark.operators.sketchledger import hdr_state_compact

    rows = [(str(19720 + d), "api", float(v)) for d in range(12) for v in range(10)]
    df = spark.createDataFrame(rows, "day string, seg string, v double")
    state = hdr_state_build(df, ["day", "seg"], "v")

    c1 = hdr_state_compact(state, "day", "19726")
    # idempotent: re-running with the same cutoff changes nothing
    again = hdr_state_compact(c1, "day", "19726")
    assert _sorted(again.collect()) == _sorted(c1.collect())

    # advancing the cutoff re-compacts the newly-expired days and the
    # result equals compacting the ORIGINAL state at the new cutoff
    c2 = hdr_state_compact(c1, "day", "19729")
    direct = hdr_state_compact(state, "day", "19729")
    assert _sorted(c2.collect()) == _sorted(direct.collect())
    days = {r.day for r in c2.select("day").distinct().collect()}
    assert days == {"19729", "19730", "19731", "m657"}


def test_kmv_estimate_guard_survives_column_pruning(spark):
    """The geometry guard must trip even when the caller projects ONLY
    est_distinct — the estimate is built from the guarded count, so
    Catalyst column pruning cannot drop the assertion (review r11)."""
    df, _, _ = _frames(spark)
    state = kmv_state_build(df, KEYS, "u", 8)
    with pytest.raises(Exception, match="kmv_state_estimate"):
        kmv_state_estimate(state, 4).select("est_distinct").collect()


def test_sketch_state_expire_handles_period_rows(spark):
    """Period rows never enter the (length, value) day compare: by
    default expire drops them (coarse history is not 'recent'); with
    keep_periods=True they pass through verbatim — in both cases the
    outcome is independent of the cutoff's digit count (review r11:
    'm33' vs cutoff '999'/'1000' used to flip silently)."""
    from scholarmind_spark.operators.sketchledger import (
        hdr_state_compact,
        sketch_state_expire,
    )

    rows = [(d, "api", 1.0) for d in ("998", "999", "1000")]
    df = spark.createDataFrame(rows, "day string, seg string, v double")
    compacted = hdr_state_compact(
        hdr_state_build(df, KEYS, "v"), "day", "999"
    )  # 998 → m33; 999/1000 retained
    for cutoff in ("999", "1000"):  # both digit counts
        days = {
            r.day
            for r in sketch_state_expire(compacted, "day", cutoff)
            .select("day").distinct().collect()
        }
        assert "m33" not in days, cutoff
        days_kept = {
            r.day
            for r in sketch_state_expire(
                compacted, "day", cutoff, keep_periods=True
            ).select("day").distinct().collect()
        }
        assert "m33" in days_kept, cutoff


def test_compact_custom_period_prefix_roundtrips(spark):
    """period_prefix threads into the default period label (review
    r11: it was hardcoded 'm', so a custom prefix produced labels the
    next compaction mis-classified)."""
    from scholarmind_spark.operators.sketchledger import hdr_state_compact

    rows = [(d, "api", 1.0) for d in ("998", "999", "1000")]
    df = spark.createDataFrame(rows, "day string, seg string, v double")
    state = hdr_state_build(df, KEYS, "v")
    c1 = hdr_state_compact(state, "day", "999", period_prefix="q")
    days = {r.day for r in c1.select("day").distinct().collect()}
    assert days == {"999", "1000", "q33"}
    # re-runnable under the same custom prefix
    again = hdr_state_compact(c1, "day", "999", period_prefix="q")
    assert _sorted(again.collect()) == _sorted(c1.collect())


def test_kmv_estimate_guard_covers_every_output_column(spark):
    """All three estimator outputs embed the geometry guard — projecting
    ANY subset (e.g. only kth_hash as a threshold) must still trip the
    assertion under a mismatched k (review r11, second pass)."""
    df, _, _ = _frames(spark)
    state = kmv_state_build(df, KEYS, "u", 8)
    for col in ("n_minima", "kth_hash", "est_distinct"):
        with pytest.raises(Exception, match="kmv_state_estimate"):
            kmv_state_estimate(state, 4).select(col).collect()


def test_sketch_state_expire_null_day_follows_periods(spark):
    """NULL-day groups are non-day rows: dropped by default expiry,
    kept verbatim with keep_periods=True — never silently lost to a
    NULL predicate (review r11, second pass)."""
    from scholarmind_spark.operators.sketchledger import sketch_state_expire

    rows = [(d, "api", 1.0) for d in ("999", "1000", None)]
    state = hdr_state_build(
        spark.createDataFrame(rows, "day string, seg string, v double"),
        KEYS,
        "v",
    )
    assert {
        r.day
        for r in sketch_state_expire(state, "day", "1000")
        .select("day").distinct().collect()
    } == {"1000"}
    assert {
        r.day
        for r in sketch_state_expire(state, "day", "1000", keep_periods=True)
        .select("day").distinct().collect()
    } == {"1000", None}
