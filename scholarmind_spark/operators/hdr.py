"""HDR-style log-bucket quantile sketch: mergeable percentiles.

Engine extension (the approximate-quantile member of the sketch
family — KMV answers "how many distinct", CMS "how often is this one",
this answers "what is p99"): a fixed-size, MERGEABLE histogram whose
buckets are log-spaced with ``p`` precision bits per octave — the
HdrHistogram design (Tene; also the bucketing behind Prometheus native
histograms).  Relative error is bounded by 2⁻ᵖ per value (p=5 →
≤ 3.2%), state is ≤ ~64·2ᵖ·2 buckets regardless of input size, and
two sketches merge by adding bucket counts — so a 100 TB percentile
job shuffles a few thousand counters, and per-shard sketches fold into
per-day / per-corpus ones EXACTLY (fold == direct, the same contract
the KMV/CMS gates pin).

Why not Spark's ``percentile_approx``: its GK summary is
implementation-defined (no DuckDB twin, no cross-engine determinism)
and not exposed as a mergeable artifact.  This sketch is pure integer
arithmetic — bit-identical on both engines:

- values are milli-quantized (``round(v*1000)`` — the PSI/zorder
  device); non-finite values are dropped on BOTH engines (Spark's
  non-ANSI cast silently corrupts, DuckDB raises — neither allowed in);
- sign is split out (``-1/0/+1``), buckets index ``|vm|``;
- for ``vm ≥ 1``: octave ``e = len(bin(vm)) - 1`` (integer bit length,
  no float log whose last-ulp could flip a boundary between engines),
  sub-bucket ``sub = (vm·2ᵖ) div 2ᵉ − 2ᵖ``, bucket ``b = e·2ᵖ + sub``;
- the bucket's value range is ``[lo, lo+w)`` with
  ``lo = (2ᵖ+sub)·2^(e−p)``, ``w = 2^(e−p)`` for ``e ≥ p`` (and the
  bucket is EXACT — w=1 — for ``e < p``); estimates report the integer
  midpoint ``lo + w div 2``.

Overflow envelope (same as operators/mi.psi_bins): the sub-bucket
multiply needs ``vm·2ᵖ < 2⁶³`` — with p=5, |value| up to ~2.9e14 after
milli scaling; quantize coarser first for larger magnitudes.

Quantile lookup sorts the ≤4k buckets once in value order (sign asc,
then sign·bucket asc) and takes a cumulative count — a SinglePartition
window, safe because the row count is bounded by the SKETCH SIZE, not
the data (the same bounded-state argument as the SNM offset window).
Ranks are ceil(q·n/1000), 1-based — the classic lower-quantile
definition, integer-exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PRECISION_BITS = 5


def _check_p(p: int) -> None:
    if not 1 <= p <= 10:
        raise ValueError("precision bits must be in 1..10")


def _vm(value: Column) -> Column:
    finite = value.isNotNull() & ~F.isnan(value) & (F.abs(value) != float("inf"))
    return F.when(finite, F.round(value * 1000, 0).cast("bigint"))


def _bucket_cols(p: int) -> tuple[Column, Column]:
    """(sign, bucket) expressions over a frame with column ``vm`` — the
    ONE Spark-side home of the octave/sub-bucket math (the grouped and
    global builders must never diverge)."""
    sign = F.when(F.col("vm") > 0, 1).when(F.col("vm") < 0, -1).otherwise(0)
    e = F.length(F.expr("bin(abs(vm))")) - 1
    sub = F.expr(
        f"(abs(vm) * {1 << p})"
        " div shiftleft(cast(1 as bigint), length(bin(abs(vm))) - 1)"
    ) - (1 << p)
    bucket = F.when(F.col("vm") == 0, F.lit(0)).otherwise(e * (1 << p) + sub)
    return sign, bucket


def _bucket_case_sql(p: int) -> tuple[str, str]:
    """(sign, bucket) SQL over a relation with column ``vm`` — the one
    DuckDB-side home of the same math."""
    tp = 1 << p
    sign = "CASE WHEN vm > 0 THEN 1 WHEN vm < 0 THEN -1 ELSE 0 END"
    bucket = f"""CASE WHEN vm = 0 THEN 0
             ELSE (length(bin(abs(vm))) - 1) * {tp}
                  + (abs(vm) * {tp}) // (1::BIGINT << (length(bin(abs(vm))) - 1))
                  - {tp}
        END"""
    return sign, bucket


def _mid_case_sql(p: int) -> str:
    """DuckDB midpoint CASE over (sign, bucket) — single home."""
    tp = 1 << p
    return f"""CASE
  WHEN sign = 0 THEN 0
  WHEN (bucket // {tp}) >= {p} THEN
    sign * ((({tp} + bucket % {tp}) << ((bucket // {tp}) - {p}))
            + ((1::BIGINT << ((bucket // {tp}) - {p})) // 2))
  ELSE sign * (({tp} + bucket % {tp}) // (1::BIGINT << ({p} - (bucket // {tp}))))
END"""


def hdr_build(
    df: DataFrame, value: Column | str, p: int = DEFAULT_PRECISION_BITS
) -> DataFrame:
    """The sketch as rows ``(sign, bucket, cnt)`` — at most
    ~2·63·2ᵖ + 1 cells regardless of input size.  One projection + one
    map-side-combined groupBy."""
    _check_p(p)
    vc = F.col(value) if isinstance(value, str) else value
    vm = _vm(vc)
    base = df.select(vm.alias("vm")).where(F.col("vm").isNotNull())
    sign, bucket = _bucket_cols(p)
    return (
        base.select(sign.alias("sign"), bucket.alias("bucket"))
        .groupBy("sign", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two sketches: union + groupBy-sum.  Exact — fold == direct
    by associativity of +.  Both must share the build-time ``p`` (the
    CMS width/depth caller contract: store p next to the sketch)."""
    return (
        a.unionByName(b)
        .groupBy("sign", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _midpoint_expr(p: int) -> str:
    """SQL expr for the integer midpoint of (sign, bucket), shared
    verbatim by both engines (Spark F.expr and the DuckDB twin)."""
    tp = 1 << p
    return f"""CASE
  WHEN sign = 0 THEN 0
  WHEN (bucket div {tp}) >= {p} THEN
    sign * (shiftleft(cast({tp} + bucket % {tp} as bigint),
                      cast((bucket div {tp}) - {p} as int))
            + (shiftleft(cast(1 as bigint),
                         cast((bucket div {tp}) - {p} as int)) div 2))
  ELSE sign * (({tp} + bucket % {tp})
               div shiftleft(cast(1 as bigint),
                             cast({p} - (bucket div {tp}) as int)))
END"""


def hdr_quantiles(
    sketch: DataFrame,
    qs_permille: tuple[int, ...] = (500, 900, 990),
    p: int = DEFAULT_PRECISION_BITS,
) -> DataFrame:
    """``q_permille, n_rows, est_milli`` per requested quantile — the
    integer midpoint of the bucket holding rank ``ceil(q·n/1000)``."""
    _check_p(p)
    for q in qs_permille:
        if not 1 <= q <= 1000:
            raise ValueError("quantiles are permille values in 1..1000")
    w = (
        Window.orderBy(F.col("sign").asc(), (F.col("sign") * F.col("bucket")).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.select(
        "sign",
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    qdf = sketch.sparkSession.createDataFrame(
        [(q,) for q in qs_permille], "q_permille int"
    )
    # rank = ceil(q*n/1000); the quantile bucket is the FIRST bucket
    # whose cumulative count reaches it (min over value order works
    # because cum is monotone along that order)
    hit = (
        qdf.crossJoin(cum)
        .where(F.col("cum") >= F.expr("(q_permille * n + 999) div 1000"))
        .groupBy("q_permille")
        .agg(
            F.max("n").alias("n_rows"),
            # min_by over sign·(2²⁰ + bucket) — a single bigint monotone
            # in value order (bucket < 2²⁰ for every legal p), so the
            # FIRST bucket at-or-past the rank wins on both engines
            F.min_by(
                F.expr(_midpoint_expr(p)),
                F.col("sign") * (F.lit(1048576) + F.col("bucket")),
            ).alias("est_milli"),
        )
    )
    return hit.select("q_permille", F.col("n_rows").cast("bigint"), F.col("est_milli").cast("bigint"))


# ------------------------------------------------------------ SQL twins


def hdr_build_sql(values_query: str, p: int = DEFAULT_PRECISION_BITS) -> str:
    """DuckDB twin of :func:`hdr_build` over a subquery yielding ``v``."""
    _check_p(p)
    sign, bucket = _bucket_case_sql(p)
    return f"""
(WITH base AS (
   SELECT round(v * 1000, 0)::BIGINT AS vm
   FROM ({values_query}) WHERE v IS NOT NULL AND isfinite(v)
 )
 SELECT {sign} AS sign,
        {bucket} AS bucket,
        count(*)::BIGINT AS cnt
 FROM base GROUP BY 1, 2)"""


def hdr_merge_sql(a: str, b: str) -> str:
    return (
        f"(SELECT sign, bucket, sum(cnt)::BIGINT AS cnt FROM "
        f"(SELECT * FROM {a} UNION ALL SELECT * FROM {b}) GROUP BY sign, bucket)"
    )


def hdr_quantiles_sql(
    sketch_query: str,
    qs_permille: tuple[int, ...] = (500, 900, 990),
    p: int = DEFAULT_PRECISION_BITS,
) -> str:
    _check_p(p)
    qvals = ", ".join(f"({q})" for q in qs_permille)
    mid = _mid_case_sql(p)
    return f"""
(WITH s AS (SELECT * FROM {sketch_query}),
 cum AS (
   SELECT sign, bucket,
          sum(cnt) OVER (ORDER BY sign ASC, sign * bucket ASC
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
          sum(cnt) OVER ()::BIGINT AS n
   FROM s
 ),
 qs(q_permille) AS (VALUES {qvals})
 SELECT q_permille, max(n)::BIGINT AS n_rows,
        min_by({mid}, sign * (1048576 + bucket))::BIGINT AS est_milli
 FROM qs, cum
 WHERE cum >= (q_permille * n + 999) // 1000
 GROUP BY q_permille)"""


# ------------------------------------------------------ grouped variant
#
# "p99 latency per endpoint" — the telemetry staple.  Identical bucket
# math; state is ≤ buckets·groups cells; the quantile window partitions
# on the GROUP key (never SinglePartition), so a hot group is bounded
# by its bucket count (≤ ~4k), not its row count.


def hdr_build_by_group(
    df: DataFrame,
    group_col: Column | str,
    value: Column | str,
    p: int = DEFAULT_PRECISION_BITS,
) -> DataFrame:
    """``grp, sign, bucket, cnt`` — :func:`hdr_build` per group.  NULL
    groups are kept as their own group (real audit segments)."""
    _check_p(p)
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    vc = F.col(value) if isinstance(value, str) else value
    vm = _vm(vc)
    base = df.select(
        g.cast("string").alias("grp"), vm.alias("vm")
    ).where(F.col("vm").isNotNull())
    sign, bucket = _bucket_cols(p)
    return (
        base.select("grp", sign.alias("sign"), bucket.alias("bucket"))
        .groupBy("grp", "sign", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_quantiles_by_group(
    sketch: DataFrame,
    qs_permille: tuple[int, ...] = (500, 990),
    p: int = DEFAULT_PRECISION_BITS,
) -> DataFrame:
    """``grp, q_permille, n_rows, est_milli`` — per-group quantiles from
    a grouped sketch."""
    _check_p(p)
    for q in qs_permille:
        if not 1 <= q <= 1000:
            raise ValueError("quantiles are permille values in 1..1000")
    order = (F.col("sign") * (F.lit(1048576) + F.col("bucket"))).asc()
    w = Window.partitionBy("grp").orderBy(order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy("grp")
    cum = sketch.select(
        "grp",
        "sign",
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    qdf = sketch.sparkSession.createDataFrame(
        [(q,) for q in qs_permille], "q_permille int"
    )
    return (
        qdf.crossJoin(cum)
        .where(F.col("cum") >= F.expr("(q_permille * n + 999) div 1000"))
        .groupBy("grp", "q_permille")
        .agg(
            F.max("n").cast("bigint").alias("n_rows"),
            F.min_by(
                F.expr(_midpoint_expr(p)),
                F.col("sign") * (F.lit(1048576) + F.col("bucket")),
            ).cast("bigint").alias("est_milli"),
        )
    )


def hdr_build_by_group_sql(
    pairs_query: str, p: int = DEFAULT_PRECISION_BITS
) -> str:
    """DuckDB twin over a subquery yielding ``grp, v``."""
    _check_p(p)
    sign, bucket = _bucket_case_sql(p)
    return f"""
(WITH base AS (
   SELECT grp::VARCHAR AS grp, round(v * 1000, 0)::BIGINT AS vm
   FROM ({pairs_query}) WHERE v IS NOT NULL AND isfinite(v)
 )
 SELECT grp,
        {sign} AS sign,
        {bucket} AS bucket,
        count(*)::BIGINT AS cnt
 FROM base GROUP BY 1, 2, 3)"""


def hdr_quantiles_by_group_sql(
    sketch_query: str,
    qs_permille: tuple[int, ...] = (500, 990),
    p: int = DEFAULT_PRECISION_BITS,
) -> str:
    _check_p(p)
    qvals = ", ".join(f"({q})" for q in qs_permille)
    mid = _mid_case_sql(p)
    return f"""
(WITH s AS (SELECT * FROM {sketch_query}),
 cum AS (
   SELECT grp, sign, bucket,
          sum(cnt) OVER (PARTITION BY grp
                         ORDER BY sign * (1048576 + bucket) ASC
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
          sum(cnt) OVER (PARTITION BY grp)::BIGINT AS n
   FROM s
 ),
 qs(q_permille) AS (VALUES {qvals})
 SELECT grp, q_permille, max(n)::BIGINT AS n_rows,
        min_by({mid}, sign * (1048576 + bucket))::BIGINT AS est_milli
 FROM qs, cum
 WHERE cum >= (q_permille * n + 999) // 1000
 GROUP BY grp, q_permille)"""
