"""Z-order (Morton) multi-dimensional data layout.

Engine extension (SURVEY §2 — the reference has no storage-layout
surface): interleave the bits of two clustering keys into one sort key
so that sorting by it co-locates rows that are close in BOTH
dimensions.  This is the layout device behind Delta/Iceberg
``OPTIMIZE ZORDER BY`` and the min/max-pruning literature (Morton 1966;
the "zone map + space-filling curve" pattern): parquet row-group
min/max stats prune a filter on EITHER key only if files are narrow in
that key — a single-column sort makes files narrow in one dimension
and full-range in the other, while the Z-curve makes every file a
small rectangle in (x, y) space.  At 100 TB the difference is a scan
of a few files vs a full-table scan for the second dimension.

Spark-first shape: ``zvalue`` is a pure integer Column expression
(unrolled shift/mask/add per bit — whole-stage codegen, no UDF);
``layout_by_zorder`` is ``repartitionByRange`` on the z-value (one
range shuffle; Spark samples split points) + ``sortWithinPartitions``
so each output file is one z-range.  Nothing else changes — readers
need no knowledge of the layout, they just get better pruning.

Determinism: the z-value is exact integer math, bit-identical in the
DuckDB twin; the locality REPORT (per-z-bucket spans) is pure
aggregation.  Only ``layout_by_zorder``'s physical file split depends
on range sampling — the VALUES are layout-independent, which is what
the gate checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of two non-negative integer keys clamped to
    ``bits`` bits each: x occupies even bit positions, y odd.  2·bits ≤
    62 keeps the result in a positive int64."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31 (2*bits must fit int64)")
    xc = x.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    yc = y.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    total: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        xb = F.shiftright(xc, i).bitwiseAND(F.lit(1))
        yb = F.shiftright(yc, i).bitwiseAND(F.lit(1))
        total = total + xb * F.lit(1 << (2 * i)) + yb * F.lit(1 << (2 * i + 1))
    return total


def zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zvalue` — identical shift/mask arithmetic."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31 (2*bits must fit int64)")
    mask = (1 << bits) - 1
    xc = f"(({x})::BIGINT & {mask})"
    yc = f"(({y})::BIGINT & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"(({xc} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({yc} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def layout_by_zorder(
    df: DataFrame,
    x_col: str,
    y_col: str,
    partitions: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Rows range-partitioned and sorted by their z-value — write this
    out and every file covers one z-range (a small (x, y) rectangle), so
    parquet min/max stats prune filters on EITHER key.

    Both keys are min-max scaled to the full ``bits`` width first (one
    extra tiny aggregate + broadcast): without it a dimension with more
    effective bits dominates every range split and the layout degrades
    to a single-column sort (see :func:`zorder_locality_report`).

    The scaling is int64 ((key - lo) · 2^bits must fit): key RANGES up
    to 2^(63-bits) are safe — epoch-micros-sized ranges need a coarser
    pre-quantization first.  Keys are cast to bigint before the
    arithmetic; int32 inputs would otherwise overflow the multiply at
    ranges ≥ 2^(31-bits) (ANSI mode turns that into a runtime error,
    non-ANSI into silent z-value corruption)."""
    rng = df.agg(
        F.min(F.col(x_col).cast("bigint")).alias("__xlo"),
        F.max(F.col(x_col).cast("bigint")).alias("__xhi"),
        F.min(F.col(y_col).cast("bigint")).alias("__ylo"),
        F.max(F.col(y_col).cast("bigint")).alias("__yhi"),
    )
    scaled = df.crossJoin(F.broadcast(rng))
    xs = F.expr(
        f"((cast({x_col} as bigint) - __xlo) * {1 << bits})"
        f" div (__xhi - __xlo + 1)"
    )
    ys = F.expr(
        f"((cast({y_col} as bigint) - __ylo) * {1 << bits})"
        f" div (__yhi - __ylo + 1)"
    )
    return (
        scaled.withColumn("__zv", zvalue(xs, ys, bits))
        .repartitionByRange(partitions, "__zv")
        .sortWithinPartitions("__zv")
        .drop("__zv", "__xlo", "__xhi", "__ylo", "__yhi")
    )


def zorder_locality_report(
    df: DataFrame,
    x_col: str,
    y_col: str,
    buckets: int = 32,
    bits: int = 16,
) -> DataFrame:
    """``strategy, bucket, n, x_span, y_span`` for two layouts of the
    same rows — ``zorder`` (bucketed by z-value range) vs ``xsort``
    (bucketed by x alone): the z-buckets stay narrow in BOTH dimensions
    while the x-sort buckets span the full y range.  This is the
    pruning-benefit statement as a deterministic aggregate, independent
    of physical file boundaries."""
    base = df.select(
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    # min-max scale EACH dimension to the full `bits` width before
    # interleaving (integer math): raw keys of unequal effective width
    # (an 8-bit user id vs a 15-bit epoch-day) would let one dimension's
    # high bits dominate every z-range split and the buckets degenerate
    # to a single-column sort — the same normalization Delta's OPTIMIZE
    # ZORDER applies via per-column range partition ids.
    rng = base.agg(
        F.min("x").alias("__xlo"), F.max("x").alias("__xhi"),
        F.min("y").alias("__ylo"), F.max("y").alias("__yhi"),
    )
    # persist(): the scaled relation feeds FIVE consumers (the per-branch
    # range aggs and both union projections) — uncached each re-runs the
    # source scan + scaling, the exact class the DuckDB twin pins with
    # AS MATERIALIZED.  Tagged via attach_caches for release_caches().
    scaled = (
        base.crossJoin(F.broadcast(rng))
        .select(
            "x",
            "y",
            F.expr(
                f"((x - __xlo) * {1 << bits}) div (__xhi - __xlo + 1)"
            ).alias("xs"),
            F.expr(
                f"((y - __ylo) * {1 << bits}) div (__yhi - __ylo + 1)"
            ).alias("ys"),
        )
        .persist()
    )
    zv = zvalue(F.col("xs"), F.col("ys"), bits)

    def bucketed(key: Column, tag: str) -> DataFrame:
        k = scaled.withColumn("__k", key)
        krng = k.agg(
            F.min("__k").alias("__lo"), F.max("__k").alias("__hi")
        )
        return (
            k.crossJoin(F.broadcast(krng))
            .select(
                F.lit(tag).alias("strategy"),
                # integer width_bucket: (k - lo) * B div (hi - lo + 1)
                F.expr(
                    f"((__k - __lo) * {buckets}) div (__hi - __lo + 1)"
                ).alias("bucket"),
                "x",
                "y",
            )
        )

    both = bucketed(zv, "zorder").unionByName(bucketed(F.col("x"), "xsort"))
    out = (
        both.groupBy("strategy", "bucket")
        .agg(
            F.count("*").alias("n"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
        .orderBy("strategy", "bucket")
    )
    from scholarmind_spark.util import attach_caches

    return attach_caches(out, [scaled])


def zorder_locality_report_sql(
    table: str,
    x_expr: str,
    y_expr: str,
    buckets: int = 32,
    bits: int = 16,
) -> str:
    """DuckDB twin of :func:`zorder_locality_report`."""
    zv = zvalue_sql("xs", "ys", bits)
    return f"""
WITH base AS MATERIALIZED (
  SELECT ({x_expr})::BIGINT AS x, ({y_expr})::BIGINT AS y FROM {table}
),
dimrng AS (
  SELECT min(x) AS xlo, max(x) AS xhi, min(y) AS ylo, max(y) AS yhi
  FROM base
),
scaled AS MATERIALIZED (
  SELECT x, y,
         ((x - xlo) * {1 << bits}) // (xhi - xlo + 1) AS xs,
         ((y - ylo) * {1 << bits}) // (yhi - ylo + 1) AS ys
  FROM base, dimrng
),
keyed AS (
  SELECT 'zorder' AS strategy, {zv} AS k, x, y FROM scaled
  UNION ALL
  SELECT 'xsort' AS strategy, x AS k, x, y FROM scaled
),
rng AS (
  SELECT strategy, min(k) AS lo, max(k) AS hi FROM keyed GROUP BY strategy
)
SELECT k.strategy,
       ((k.k - r.lo) * {buckets}) // (r.hi - r.lo + 1) AS bucket,
       count(*)::BIGINT AS n,
       (max(k.x) - min(k.x))::BIGINT AS x_span,
       (max(k.y) - min(k.y))::BIGINT AS y_span
FROM keyed k JOIN rng r ON k.strategy = r.strategy
GROUP BY k.strategy, bucket
ORDER BY k.strategy, bucket
"""
