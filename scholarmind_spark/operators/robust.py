"""Per-group winsorization: clip values to discrete percentile bounds.

Engine extension (SURVEY §2): robust-statistics cleaning for metric
columns — cap outliers at the p01/p99 (configurable) order statistics
of their own group before aggregation, the standard defense against
long-tail corruption (bot traffic, sensor glitches, unit mistakes)
distorting means and models.

Exactness contract: bounds are DISCRETE order statistics (the k-th
smallest actual value, k = ceil(p·n) computed in integer rational
arithmetic ``(n·p_micro + 999_999) div 1_000_000``), never an
interpolated quantile — so no synthesized float exists, clipping
returns only values present in the data (or the bound itself), and
the k-th order statistic is well-defined under duplicate values no
matter how ties are ordered.  Nothing here can drift between engines.

Spark-first shape: one shuffle on the group key; within it a single
window pass ranks values, the two per-group bound rows are filtered
out (a tiny relation, broadcast back), and the clip is a JVM
``least/greatest``.  At 100 TB the window sort dominates — identical
to any per-group quantile — and heavily-skewed groups get the usual
composite-key treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    p_lo_micro: int = 10_000,
    p_hi_micro: int = 990_000,
) -> DataFrame:
    """``*id_cols, group, value, value_w`` with ``value_w`` clipped to the
    group's [p_lo, p_hi] discrete order statistics (percentiles given in
    integer micro units of probability)."""
    # null values are excluded outright (a null can be neither ranked nor
    # clipped) — also sidesteps the engines' opposite default null sort
    # order (Spark NULLS FIRST vs DuckDB NULLS LAST)
    base = df.filter(F.col(value_col).isNotNull()).select(
        *[F.col(c) for c in id_cols],
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
    )
    w = Window.partitionBy("g").orderBy("v")
    ranked = base.select(
        "g",
        "v",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy("g")).alias("__n"),
    )
    k_lo = F.expr(f"greatest((__n * {p_lo_micro} + {MICRO - 1}) div {MICRO}, 1)")
    k_hi = F.expr(f"greatest((__n * {p_hi_micro} + {MICRO - 1}) div {MICRO}, 1)")
    bounds = (
        ranked.filter((F.col("__rn") == k_lo) | (F.col("__rn") == k_hi))
        .groupBy("g")
        .agg(F.min("v").alias("__lo"), F.max("v").alias("__hi"))
    )
    return (
        # eqNullSafe: a NULL group is a real group (groupBy kept it in
        # `bounds`), and an equi-join on g would silently DROP its rows
        # from a per-row passthrough operator
        # no broadcast hint: bounds has one row per group, and the group
        # key's cardinality is unbounded by this API (winsorize by user_id
        # is a legitimate call); AQE broadcasts when actually small
        base.join(bounds, base["g"].eqNullSafe(bounds["g"]))
        .drop(bounds["g"])
        .select(
            *id_cols,
            F.col("g").alias(group_col),
            F.col("v").alias(value_col),
            F.least(F.greatest(F.col("v"), F.col("__lo")), F.col("__hi")).alias(
                f"{value_col}_w"
            ),
        )
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """``group, wmedian`` — the lower weighted median per group: the
    smallest value whose running weight (ordered by value, ties by
    value only — the prefix weight of equal values is order-free)
    reaches half the group's total weight.

    All-integer selection: weights are int64, the threshold compare is
    ``2 * cumw >= total_w`` (no halving, no floats), and the chosen
    value is an actual data value.  One shuffle on the group key, one
    window pass — the same cost envelope as any per-group quantile.
    Null values or weights are excluded (not rankable); so are
    NON-POSITIVE weights — the tie-order-free claim only holds when the
    running weight is monotone, and a negative weight inside a tie run
    would make the crossing row order-dependent (a zero weight can never
    be "the" median row anyway, matching weighted_sample's w > 0 rule)."""
    base = df.filter(
        F.col(value_col).isNotNull() & (F.col(weight_col) > 0)
    ).select(
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.col(weight_col).cast("long").alias("w"),
    )
    w_cum = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = base.select(
        "g",
        "v",
        F.sum("w").over(w_cum).alias("__cumw"),
        F.sum("w").over(Window.partitionBy("g")).alias("__tot"),
    )
    # ties on v share a value, so WHICH tied row first crosses the
    # threshold cannot change the selected v
    return (
        ranked.filter(F.lit(2) * F.col("__cumw") >= F.col("__tot"))
        .groupBy("g")
        .agg(F.min("v").alias("wmedian"))
        .select(F.col("g").alias(group_col), "wmedian")
    )


def weighted_median_sql(
    table: str, group_col: str, value_col: str, weight_col: str
) -> str:
    """DuckDB twin of :func:`weighted_median`."""
    return f"""
WITH __b AS (
  SELECT {group_col} AS g, {value_col} AS v, {weight_col}::BIGINT AS w
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {weight_col} > 0
),
__r AS (
  SELECT g, v,
         sum(w) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )::BIGINT AS cumw,
         sum(w) OVER (PARTITION BY g)::BIGINT AS tot
  FROM __b
)
SELECT g AS {group_col}, min(v) AS wmedian
FROM __r WHERE 2 * cumw >= tot GROUP BY g"""


def winsorize_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    p_lo_micro: int = 10_000,
    p_hi_micro: int = 990_000,
) -> str:
    """DuckDB twin of :func:`winsorize`."""
    ids = ", ".join(id_cols)
    return f"""
WITH __t AS (SELECT * FROM {table} WHERE {value_col} IS NOT NULL),
__ranked AS (
  SELECT {group_col} AS g, {value_col} AS v,
         row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) AS rn,
         count(*) OVER (PARTITION BY {group_col})::BIGINT AS n
  FROM __t
),
__bounds AS (
  SELECT g, min(v) AS lo, max(v) AS hi
  FROM __ranked
  WHERE rn = greatest((n * {p_lo_micro} + {MICRO - 1}) // {MICRO}, 1)
     OR rn = greatest((n * {p_hi_micro} + {MICRO - 1}) // {MICRO}, 1)
  GROUP BY g
)
SELECT {ids}, t.{group_col}, t.{value_col},
       least(greatest(t.{value_col}, b.lo), b.hi) AS {value_col}_w
FROM __t t JOIN __bounds b ON t.{group_col} IS NOT DISTINCT FROM b.g"""


def interarrival_quantiles(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    p_lo_micro: int = 500_000,
    p_hi_micro: int = 900_000,
    min_gaps: int = 3,
) -> DataFrame:
    """``key, n_gaps, p50_gap_us, p90_gap_us`` (names fixed to the
    default percentiles) — per-key discrete quantiles of the
    inter-event gaps, in exact integer microseconds.

    The cadence profile behind engagement scoring, bot detection
    (impossibly regular or impossibly fast gaps), and retention
    features.  Everything is integer: gaps are instant micros minus
    instant micros, and the quantiles are the k-th order statistics
    with ``k = (n·p + 999999) div 1e6`` — the same tie-safe selection
    device as :func:`winsorize`, so no engine can disagree.

    One shuffle on the key; a lag window for gaps and a rank window for
    selection ride the same partitioning (single Exchange in the plan).
    """
    # TZ-free epoch micros for BOTH timestamp dtypes the parquet reader
    # can produce: NTZ goes through pure wall-clock timestampdiff (an
    # NTZ→instant cast would route through the session timezone — the
    # r2/r3 failure class), LTZ through unix_micros (already an instant)
    dt = dict(df.dtypes).get(ts_col, "timestamp")
    us = (
        F.unix_micros(F.col(ts_col))
        if dt == "timestamp"
        else F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    )
    w = Window.partitionBy("k").orderBy("us", order_tiebreak)
    gaps = (
        df.select(
            F.col(key_col).alias("k"),
            us.alias("us"),
            F.col(order_tiebreak),
        )
        .select("k", (F.col("us") - F.lag("us").over(w)).alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    wg = Window.partitionBy("k").orderBy("gap")
    ranked = gaps.select(
        "k",
        "gap",
        F.row_number().over(wg).alias("__rn"),
        F.count("*").over(Window.partitionBy("k")).alias("__n"),
    ).filter(F.col("__n") >= min_gaps)
    k_lo = F.expr(f"greatest((__n * {p_lo_micro} + {MICRO - 1}) div {MICRO}, 1)")
    k_hi = F.expr(f"greatest((__n * {p_hi_micro} + {MICRO - 1}) div {MICRO}, 1)")
    return (
        ranked.filter((F.col("__rn") == k_lo) | (F.col("__rn") == k_hi))
        .groupBy("k")
        .agg(
            F.max("__n").cast("bigint").alias("n_gaps"),
            F.min("gap").alias("p50_gap_us"),
            F.max("gap").alias("p90_gap_us"),
        )
        .select(F.col("k").alias(key_col), "n_gaps", "p50_gap_us", "p90_gap_us")
    )


def interarrival_quantiles_sql(
    table: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    p_lo_micro: int = 500_000,
    p_hi_micro: int = 900_000,
    min_gaps: int = 3,
) -> str:
    """DuckDB twin of :func:`interarrival_quantiles`."""
    return f"""
WITH __g AS (
  SELECT k, gap FROM (
    SELECT {key_col} AS k,
           epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w AS gap
    FROM {table}
    WINDOW w AS (PARTITION BY {key_col} ORDER BY epoch_us({ts_col}), {order_tiebreak})
  ) WHERE gap IS NOT NULL
),
__r AS (
  SELECT k, gap,
         row_number() OVER (PARTITION BY k ORDER BY gap) AS rn,
         count(*) OVER (PARTITION BY k)::BIGINT AS n
  FROM __g
)
SELECT k AS {key_col}, max(n) AS n_gaps,
       min(gap) AS p50_gap_us, max(gap) AS p90_gap_us
FROM __r
WHERE n >= {min_gaps}
  AND (rn = greatest((n * {p_lo_micro} + {MICRO - 1}) // {MICRO}, 1)
       OR rn = greatest((n * {p_hi_micro} + {MICRO - 1}) // {MICRO}, 1))
GROUP BY k"""


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    k_milli: int = 3_000,
) -> DataFrame:
    """``*id_cols, group, value, med, mad, outlier`` — robust outlier
    flags per group: ``|v − median| > (k_milli/1000) · MAD`` with MAD
    the median absolute deviation.  Unlike the mean/σ z-test
    (operators/anomaly.py), the breakdown point is 50%: half the group
    can be garbage and the fence still stands — the right screen when
    outliers are common enough to poison the mean itself.

    Median and MAD are LOWER MEDIANS selected by the same tie-safe
    integer rank device as :func:`winsorize` (``k = ceil(n/2)``), so
    both are actual data-derived values; the fence compare
    ``|v−med|·1000 > k_milli·mad`` multiplies each side by an integer
    once — one IEEE operation per side, identical on both engines.
    Null values are excluded.

    Three passes over the group partition (rank for median, rank for
    MAD, flag join) — all riding one hash partitioning on the group;
    the two per-group scalars broadcast back.
    """
    base = df.filter(F.col(value_col).isNotNull()).select(
        *[F.col(c) for c in id_cols],
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
    )
    w = Window.partitionBy("g").orderBy("v")
    k_med = F.expr("(__n + 1) div 2")  # lower median rank
    med = (
        base.select(
            "g",
            "v",
            F.row_number().over(w).alias("__rn"),
            F.count("*").over(Window.partitionBy("g")).alias("__n"),
        )
        .filter(F.col("__rn") == k_med)
        .select("g", F.col("v").alias("__med"))
    )
    # eqNullSafe throughout: NULL is a real group (see winsorize).  The
    # per-group relations (med/mad) carry NO broadcast hint — group-key
    # cardinality is unbounded by this API; AQE broadcasts when small.
    dev = (
        base.join(med, base["g"].eqNullSafe(med["g"]))
        .drop(med["g"])
        .select("g", F.abs(F.col("v") - F.col("__med")).alias("d"))
    )
    wd = Window.partitionBy("g").orderBy("d")
    mad = (
        dev.select(
            "g",
            "d",
            F.row_number().over(wd).alias("__rn"),
            F.count("*").over(Window.partitionBy("g")).alias("__n"),
        )
        .filter(F.col("__rn") == k_med)
        .select("g", F.col("d").alias("__mad"))
    )
    joined = (
        base.join(med, base["g"].eqNullSafe(med["g"]))
        .drop(med["g"])
    )
    return (
        joined.join(mad, joined["g"].eqNullSafe(mad["g"]))
        .drop(mad["g"])
        .select(
            *id_cols,
            F.col("g").alias(group_col),
            F.col("v").alias(value_col),
            F.col("__med").alias("med"),
            F.col("__mad").alias("mad"),
            (
                F.abs(F.col("v") - F.col("__med")) * F.lit(1000)
                > F.lit(k_milli) * F.col("__mad")
            ).alias("outlier"),
        )
    )


def mad_outliers_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_cols: list[str],
    k_milli: int = 3_000,
) -> str:
    """DuckDB twin of :func:`mad_outliers`."""
    ids = ", ".join(id_cols)
    return f"""
WITH __b AS (
  SELECT {ids}, {group_col} AS g, {value_col}::DOUBLE AS v
  FROM {table} WHERE {value_col} IS NOT NULL
),
__med AS (
  SELECT g, v AS med FROM (
    SELECT g, v,
           row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
           count(*) OVER (PARTITION BY g)::BIGINT AS n
    FROM __b
  ) WHERE rn = (n + 1) // 2
),
__mad AS (
  SELECT g, d AS mad FROM (
    SELECT b.g, abs(b.v - m.med) AS d,
           row_number() OVER (PARTITION BY b.g ORDER BY abs(b.v - m.med)) AS rn,
           count(*) OVER (PARTITION BY b.g)::BIGINT AS n
    FROM __b b JOIN __med m ON b.g IS NOT DISTINCT FROM m.g
  ) WHERE rn = (n + 1) // 2
)
SELECT {ids}, b.g AS {group_col}, b.v AS {value_col}, m.med, a.mad,
       (abs(b.v - m.med) * 1000 > {k_milli} * a.mad) AS outlier
FROM __b b JOIN __med m ON b.g IS NOT DISTINCT FROM m.g JOIN __mad a ON b.g IS NOT DISTINCT FROM a.g"""


# ----------------------------------------------- subsample stability CI
#
# "Is this metric stable, or an artifact of which half of the data you
# looked at?" — the question a 100 TB pipeline answers BEFORE alerting
# on a mean.  Deterministic half-sample subsampling (the m-out-of-n
# bootstrap with m = n/2, Politis-Romano-Wolf): replica r keeps row i
# iff hash(id, r) is even, so each of R replicas is an independent
# pseudo-random half of the data, and the spread of the replica means
# bounds the metric's sampling variability.  No RNG, no seed plumbing:
# the 60-bit md5 device makes membership a pure column expression —
# identical replicas on any engine, cluster, or rerun.
#
# All-integer determinism: values are milli-quantized once, every
# replica aggregate is an int64 sum, and replica means are integer
# division (milli-unit floor) — the order statistics over the R replica
# means are then exact, so the "CI" bounds (2nd smallest / 2nd largest
# of R=32 ≈ the 5th/95th percentile) are bit-reproducible.  One explode
# by R and one map-side-combined groupBy; shuffle = R rows per
# partition after partial aggregation.


def subsample_metric_ci(
    df,
    id_col: str,
    value_col: str,
    replicas: int = 32,
):
    """One row: ``n_rows, mean_milli, n_replicas, ci_lo_milli,
    ci_hi_milli, spread_milli`` — the full-data mean (milli units)
    with half-sample replica bounds (2nd smallest / 2nd largest replica
    mean)."""
    from scholarmind_spark.operators.neardup import minhash_base

    from scholarmind_spark.util import attach_caches

    if replicas < 4:
        raise ValueError("need >= 4 replicas for 2nd-order statistics")
    v_milli = F.round(F.col(value_col) * 1000, 0).cast("bigint")
    # NULL metric values are excluded up front: a replica whose kept rows
    # were all NULL would otherwise yield a NULL replica mean, which
    # Spark's collect_list DROPS while DuckDB's list() keeps — an engine
    # divergence in the order statistics.  persist(): both the exploded
    # branch and the full-mean branch read this frame; uncached each
    # would re-scan + re-quantize the whole input.
    base = (
        df.select(F.col(id_col).cast("string").alias("id"), v_milli.alias("vm"))
        .where(F.col("vm").isNotNull())
        .persist()
    )
    exploded = base.select(
        "id", "vm", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("r")
    ).where(
        minhash_base(F.concat(F.col("id"), F.lit(":"), F.col("r").cast("string")))
        % 2
        == 0
    )
    rep_means = exploded.groupBy("r").agg(
        F.expr("sum(vm) div count(*)").alias("rep_mean_milli")
    )
    rep_stats = rep_means.agg(
        F.count("*").alias("n_replicas"),
        F.sort_array(F.collect_list("rep_mean_milli")).alias("ms"),
    ).select(
        "n_replicas",
        # Guard the REALIZED replica count (the replicas>=4 parameter
        # check can't see replicas that kept zero rows): with < 2 means
        # the 2nd order statistics don't exist — NULL bounds, not an
        # ARRAY_INDEX_OUT_OF_BOUNDS under spark.sql.ansi.enabled.  CASE
        # branches evaluate lazily on both engines, so the guarded
        # element_at is never reached when it would throw.
        F.when(F.col("n_replicas") >= 2, F.element_at("ms", 2)).alias(
            "ci_lo_milli"
        ),
        F.when(F.col("n_replicas") >= 2, F.element_at("ms", -2)).alias(
            "ci_hi_milli"
        ),
        F.when(
            F.col("n_replicas") >= 1,
            F.element_at("ms", -1) - F.element_at("ms", 1),
        ).alias("spread_milli"),
    )
    full = base.agg(
        F.count("*").alias("n_rows"),
        F.expr("sum(vm) div count(*)").alias("mean_milli"),
    )
    out = full.crossJoin(rep_stats).select(
        "n_rows", "mean_milli", "n_replicas",
        "ci_lo_milli", "ci_hi_milli", "spread_milli",
    )
    return attach_caches(out, [base])


def subsample_metric_ci_sql(
    table: str, id_expr: str, value_expr: str, replicas: int = 32
) -> str:
    """DuckDB twin of :func:`subsample_metric_ci` — same hash
    membership, same integer milli math, same order statistics."""
    from scholarmind_spark.operators.neardup import minhash_base_sql

    h = minhash_base_sql("(id || ':' || r::VARCHAR)")
    return f"""
WITH base AS MATERIALIZED (
  SELECT * FROM (
    SELECT ({id_expr})::VARCHAR AS id,
           round(({value_expr}) * 1000, 0)::BIGINT AS vm
    FROM {table}
  ) WHERE vm IS NOT NULL
),
exploded AS (
  SELECT id, vm, r
  FROM base, (SELECT unnest(range(0, {replicas})) AS r)
  WHERE {h} % 2 = 0
),
rep_means AS (
  SELECT r, sum(vm)::BIGINT // count(*) AS rep_mean_milli
  FROM exploded GROUP BY r
),
rep_stats AS (
  SELECT count(*)::BIGINT AS n_replicas,
         list_sort(list(rep_mean_milli)) AS ms
  FROM rep_means
),
fullagg AS (
  SELECT count(*)::BIGINT AS n_rows, sum(vm)::BIGINT // count(*) AS mean_milli
  FROM base
)
SELECT n_rows, mean_milli, n_replicas,
       CASE WHEN n_replicas >= 2 THEN ms[2] END AS ci_lo_milli,
       CASE WHEN n_replicas >= 2 THEN ms[-2] END AS ci_hi_milli,
       CASE WHEN n_replicas >= 1 THEN (ms[-1] - ms[1]) END AS spread_milli
FROM fullagg, rep_stats
"""
