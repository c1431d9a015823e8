"""Endpoint probe for the sketch-state ledger FOLD path + a 90-day
retention simulation.

The dedup-ledger probes certified ``ledger_match``/``ledger_revise``;
this is the same certification for the sketch-state folds the
``sketch_ledger_roundtrip`` gate pins and ``stream_fold_sketch_state``
runs per microbatch.  The claim under test is "each fold shuffles
O(state), never O(raw data)": with the PER-DAY BATCH FIXED and the
STATE GROWING (1x/10x/20x day counts — 30/300/600 days of day×segment
HDR state), fold time and drift-answer time must stay linear in the
state's day count with a small slope, because the fold only unions the
delta against state rows and the drift windows hold one row per
(seg, day).

Probe protocol matches ``endpoint_probe.py``: 3 reps per point,
per-point medians, least-squares ``t = a + b·k`` over the three
medians with the honest 1-dof standard error.  Run serially (no
concurrent Spark work) or the medians are garbage.

The second half simulates 90 sequential daily folds THROUGH PARQUET
(the production state shape: read snapshot, merge delta, compact,
staged write + swap) with a 7-day day-grain retention and the
'm'||(day div 30) monthly coarse grain, and verifies the final
compacted state equals a direct mixed-grain build over all 90 batches
(compact-each-fold == compact-once by additivity) while reporting the
state-size ceiling the compaction enforces.

Usage: python tools/fold_probe.py [sf_dir] [probe|simulate] ...
(default: both, sf0.1).  Prints markdown rows to paste into SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KS = (1, 10, 20)
REPS = 3
BASE_DAYS = 30  # the events table spans days 19723..19752


def _fit_row(name: str, by_k: dict[int, float]) -> str:
    xs = list(KS)
    ys = [by_k[k] for k in KS]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
    a = my - b * mx
    resid = [y - (a + b * x) for x, y in zip(xs, ys)]
    se = (sum(r * r for r in resid) / (n - 2) / sxx) ** 0.5
    return (
        f"| {name} | {by_k[1]:.1f}s | {by_k[10]:.1f}s | {by_k[20]:.1f}s "
        f"| {a:.1f}s | {b:.2f} ± {se:.2f} s/unit |"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    modes = set(sys.argv[2:]) or {"probe", "simulate"}

    from pyspark.sql import functions as F

    from scholarmind_spark import get_spark
    from scholarmind_spark.operators.sketchledger import (
        hdr_state_build,
        hdr_state_compact,
        hdr_state_drift,
        hdr_state_merge,
    )

    spark = get_spark(app_name="fold-probe")
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    keyed = events.select(
        F.expr("unix_timestamp(ts) div 86400").cast("bigint").alias("dayn"),
        F.col("event_type").alias("seg"),
        F.col("value").alias("v"),
    )
    base_state = hdr_state_build(
        keyed.select(F.col("dayn").cast("string").alias("day"), "seg", "v"),
        ["day", "seg"],
        "v",
    ).persist()
    base_rows = base_state.count()
    min_day = keyed.agg(F.min("dayn")).first()[0]
    max_day = keyed.agg(F.max("dayn")).first()[0]

    # the fixed per-day delta: ONE real day's events (the production
    # microbatch), relabeled past every replicated state day so the
    # fold always appends a genuinely new day
    one_day = keyed.where(F.col("dayn") == max_day).persist()
    one_day.count()

    def replicate(base, k: int, cols: list):
        # k state replicas with +40*i day offsets: 30·k distinct days
        # (the 30 base days fit inside each 40-day stride), segments
        # shared — exactly "state growing, per-day batch fixed".  ONE
        # device for every family so the slope comparison compares like
        # with like.
        reps = spark.range(k).select(F.col("id").alias("i"))
        return base.crossJoin(reps).select(
            (F.col("day").cast("bigint") + F.col("i") * 40)
            .cast("string")
            .alias("day"),
            *cols,
        )

    def state_at(k: int):
        return replicate(base_state, k, ["seg", "sign", "bucket", "cnt"])

    if "probe" in modes:
        from scholarmind_spark.operators.sketchledger import (
            bloom_state_build,
            bloom_state_merge,
            kmv_state_build,
            kmv_state_merge,
        )

        delta_day = max_day + 40 * max(KS)  # past every replica's days
        delta_src = one_day.select(
            F.lit(str(delta_day)).alias("day"),
            "seg",
            "v",
            F.col("v").cast("string").alias("u"),
        )
        delta = hdr_state_build(delta_src, ["day", "seg"], "v").persist()
        delta.count()
        delta_kmv = kmv_state_build(delta_src, ["day", "seg"], "u", 64).persist()
        delta_kmv.count()
        delta_bloom = bloom_state_build(
            delta_src, ["day", "seg"], "u", 64, 4
        ).persist()
        delta_bloom.count()

        # same day-offset replication for the set-semantics families:
        # base states built once, day keys shifted per replica
        base_src = keyed.select(
            F.col("dayn").cast("string").alias("day"),
            "seg",
            F.col("v").cast("string").alias("u"),
        )
        base_kmv = kmv_state_build(base_src, ["day", "seg"], "u", 64).persist()
        base_kmv.count()
        base_bloom = bloom_state_build(
            base_src, ["day", "seg"], "u", 64, 4
        ).persist()
        base_bloom.count()

        def _noop(df):
            df.write.mode("overwrite").format("noop").save()

        medians: dict[str, dict[int, float]] = {
            "hdr_state_merge": {},
            "hdr_state_drift": {},
            "kmv_state_merge": {},
            "bloom_state_merge": {},
        }
        for k in KS:
            st = state_at(k).persist()
            n_cells = st.count()
            st_kmv = replicate(base_kmv, k, ["seg", "h"]).persist()
            st_kmv.count()
            st_bloom = replicate(base_bloom, k, ["seg", "word", "bits"]).persist()
            st_bloom.count()
            for name, fn in (
                ("hdr_state_merge", lambda: _noop(hdr_state_merge(st, delta))),
                ("hdr_state_drift", lambda: hdr_state_drift(st).count()),
                (
                    "kmv_state_merge",
                    lambda: _noop(kmv_state_merge(st_kmv, delta_kmv, 64)),
                ),
                (
                    "bloom_state_merge",
                    lambda: _noop(bloom_state_merge(st_bloom, delta_bloom)),
                ),
            ):
                per = []
                for _ in range(REPS):
                    t0 = time.time()
                    fn()
                    per.append(time.time() - t0)
                per.sort()
                medians[name][k] = per[len(per) // 2]
                print(
                    f"# k={k} ({k * BASE_DAYS} days, {n_cells} hdr cells) "
                    f"{name}: median {medians[name][k]:.2f}s of "
                    f"{[round(p, 2) for p in per]}",
                    file=sys.stderr,
                )
            st.unpersist()
            st_kmv.unpersist()
            st_bloom.unpersist()
        print("| operator | 1x med | 10x med | 20x med | fixed a | slope b ± se |")
        print("|---|---|---|---|---|---|")
        for name, by_k in medians.items():
            print(_fit_row(name, by_k))

    if "simulate" in modes:
        # 90 sequential daily folds through parquet with retention 7
        # days + monthly coarsening applied at every fold
        root = tempfile.mkdtemp(prefix="foldsim_")
        state_path = os.path.join(root, "state")
        max_rows = 0
        t0 = time.time()
        batches = []
        for i in range(90):
            day = str(min_day + i)
            batch = one_day.select(F.lit(day).alias("day"), "seg", "v")
            batches.append(batch)
            delta = hdr_state_build(batch, ["day", "seg"], "v")
            if os.path.isdir(state_path):
                snap = spark.read.schema(delta.schema).parquet(state_path)
                merged = hdr_state_merge(snap, delta)
            else:
                merged = delta
            cutoff = str(min_day + i - 6)
            compacted = hdr_state_compact(merged, "day", cutoff)
            staging = f"{state_path}.staging"
            compacted.coalesce(1).write.mode("overwrite").parquet(staging)
            if os.path.isdir(state_path):
                shutil.rmtree(state_path)
            os.rename(staging, state_path)
            n = spark.read.parquet(state_path).count()
            max_rows = max(max_rows, n)
        elapsed = time.time() - t0

        final = spark.read.parquet(state_path)
        final_rows = final.count()
        final_days = final.select("day").distinct().count()

        # direct mixed-grain build over ALL 90 batches at the final
        # cutoff — compact-each-fold must equal compact-once
        from functools import reduce

        all_rows = reduce(lambda a, b: a.unionByName(b), batches)
        direct = hdr_state_compact(
            hdr_state_build(all_rows, ["day", "seg"], "v"),
            "day",
            str(min_day + 89 - 6),
        )
        uncompacted_rows = hdr_state_build(all_rows, ["day", "seg"], "v").count()
        mism = (
            final.withColumnRenamed("cnt", "va")
            .join(
                direct.withColumnRenamed("cnt", "vb"),
                ["day", "seg", "sign", "bucket"],
                "full_outer",
            )
            .where(~F.col("va").eqNullSafe(F.col("vb")))
            .count()
        )
        print(
            f"| hdr 90-day fold+compact (7-day retention, monthly grain) "
            f"| state ceiling {max_rows} rows, final {final_rows} rows "
            f"/ {final_days} grains vs {uncompacted_rows} uncompacted "
            f"| compact-each-fold == compact-once: mismatch {mism} "
            f"| {elapsed:.0f}s for 90 folds |"
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
