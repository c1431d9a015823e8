"""Mutual information between two discrete columns (micro-nat exact).

Engine extension (SURVEY §2): quantify the statistical dependence
between two columns of a table —

    I(X;Y) = Σ_xy  p(x,y) · ln( p(x,y) / (p(x)·p(y)) )

the workhorse screen for label leakage ("does this metadata column
secretly encode the target?"), feature relevance ranking, and drift
detection between schema fields.  ``I = 0`` iff independent.

Cross-engine exact via the two-level q_micro device proven by
``char_entropy``: with integer counts c_xy, c_x, c_y, N the per-cell
term

    c_xy · ( ln(c_xy) + ln(N) − ln(c_x) − ln(c_y) )

is quantized to int64 MICRO-nats BEFORE the sum (int64 addition is
order-free), and the final division by N is pinned integer rounding
``(s + N div 2) div N``.  Every ln argument is an integer-valued
double, identical on both engines.

Spark-first shape: one shuffle builds the (x, y) contingency cells
with map-side partial aggregation; the margins are two tiny
re-aggregations OF THE CELLS (not the input — the corpus is scanned
once); margins and the N scalar broadcast into the cell join.  At
100 TB the cost is the one groupBy of the input — everything after
is proportional to distinct cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def mutual_information(
    df: DataFrame, x: Column | str, y: Column | str
) -> DataFrame:
    """One row ``n_rows, n_cells, mi_micro`` — I(X;Y) in integer
    micro-nats over the non-null (x, y) pairs."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    cells = (
        df.select(xc.alias("x"), yc.alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
    )
    mx = cells.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    my = cells.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n = cells.agg(
        F.sum("c_xy").alias("__n"), F.count("*").alias("__cells")
    )
    term = F.round(
        F.col("c_xy")
        * (
            F.log("c_xy")
            + F.log("__n")
            - F.log("c_x")
            - F.log("c_y")
        )
        * F.lit(float(MICRO))
    ).cast("bigint")
    scored = (
        # no broadcast hints on the margins: mx/my have one row per
        # distinct value, and the advertised use (label-leakage screening
        # of arbitrary metadata columns) includes near-unique columns
        # where the margin is input-sized.  AQE broadcasts when small.
        cells.join(mx, "x")
        .join(my, "y")
        .crossJoin(F.broadcast(n))
        .select("__n", "__cells", term.alias("__term"))
    )
    return scored.agg(
        F.max("__n").cast("bigint").alias("n_rows"),
        F.max("__cells").cast("bigint").alias("n_cells"),
        F.expr("(sum(__term) + max(__n) div 2) div max(__n)").alias(
            "mi_micro"
        ),
    )


def mutual_information_sql(table: str, x_expr: str, y_expr: str) -> str:
    """DuckDB twin of :func:`mutual_information`."""
    return f"""
WITH __cells AS (
  SELECT x, y, count(*)::BIGINT AS c_xy FROM (
    SELECT {x_expr} AS x, {y_expr} AS y FROM {table}
  ) WHERE x IS NOT NULL AND y IS NOT NULL
  GROUP BY x, y
),
__mx AS (SELECT x, sum(c_xy)::BIGINT AS c_x FROM __cells GROUP BY x),
__my AS (SELECT y, sum(c_xy)::BIGINT AS c_y FROM __cells GROUP BY y),
__n AS (SELECT sum(c_xy)::BIGINT AS n, count(*)::BIGINT AS cells FROM __cells)
SELECT (SELECT n FROM __n) AS n_rows,
       (SELECT cells FROM __n) AS n_cells,
       (sum(round(c.c_xy * (ln(c.c_xy) + ln((SELECT n FROM __n))
                            - ln(m.c_x) - ln(y.c_y))
                  * {MICRO}.0)::BIGINT)::BIGINT
        + (SELECT n FROM __n) // 2) // (SELECT n FROM __n) AS mi_micro
FROM __cells c
JOIN __mx m ON c.x = m.x
JOIN __my y ON c.y = y.y"""


def drift_kl(
    df: DataFrame,
    group: Column | str,
    category: Column | str,
) -> DataFrame:
    """``grp, n_rows, kl_micro`` — KL( P(category | group) ‖ P(category) )
    per group, in integer micro-nats: the distribution-drift monitor
    (per-day event mix vs the overall mix, per-crawl-batch language mix
    vs the corpus, ...).  0 means the slice looks like the whole.

    Same two-level q_micro device as :func:`mutual_information`: with
    integer counts c_gt, n_g, C_t, N the per-cell term

        c_gt · ( ln c_gt + ln N − ln n_g − ln C_t )

    is quantized to int64 micro-nats before the per-group sum, and the
    final division by n_g is pinned integer rounding.

    One shuffle builds the (group, category) cells; margins re-aggregate
    the cells and broadcast back.
    """
    gc = F.col(group) if isinstance(group, str) else group
    cc = F.col(category) if isinstance(category, str) else category
    cells = (
        df.select(gc.alias("g"), cc.alias("t"))
        .filter(F.col("g").isNotNull() & F.col("t").isNotNull())
        .groupBy("g", "t")
        .agg(F.count("*").alias("c_gt"))
    )
    mg = cells.groupBy("g").agg(F.sum("c_gt").alias("n_g"))
    mt = cells.groupBy("t").agg(F.sum("c_gt").alias("c_t"))
    n = cells.agg(F.sum("c_gt").alias("__n"))
    term = F.round(
        F.col("c_gt")
        * (
            F.log("c_gt")
            + F.log("__n")
            - F.log("n_g")
            - F.log("c_t")
        )
        * F.lit(1000000.0)
    ).cast("bigint")
    return (
        # margins un-hinted for the same reason as mutual_information
        cells.join(mg, "g")
        .join(mt, "t")
        .crossJoin(F.broadcast(n))
        .select("g", "n_g", term.alias("__term"))
        .groupBy("g")
        .agg(
            F.max("n_g").cast("bigint").alias("n_rows"),
            F.expr("(sum(__term) + max(n_g) div 2) div max(n_g)").alias(
                "kl_micro"
            ),
        )
        .select(F.col("g").alias("grp"), "n_rows", "kl_micro")
    )


def drift_kl_sql(table: str, group_expr: str, category_expr: str) -> str:
    """DuckDB twin of :func:`drift_kl`."""
    return f"""
WITH __cells AS MATERIALIZED (
  SELECT g, t, count(*)::BIGINT AS c_gt FROM (
    SELECT {group_expr} AS g, {category_expr} AS t FROM {table}
  ) WHERE g IS NOT NULL AND t IS NOT NULL
  GROUP BY g, t
),
__mg AS (SELECT g, sum(c_gt)::BIGINT AS n_g FROM __cells GROUP BY g),
__mt AS (SELECT t, sum(c_gt)::BIGINT AS c_t FROM __cells GROUP BY t),
__n AS (SELECT sum(c_gt)::BIGINT AS n FROM __cells)
SELECT c.g AS grp, max(m.n_g) AS n_rows,
       (sum(round(c.c_gt * (ln(c.c_gt) + ln((SELECT n FROM __n))
                            - ln(m.n_g) - ln(t.c_t))
                  * 1000000.0)::BIGINT)::BIGINT
        + max(m.n_g) // 2) // max(m.n_g) AS kl_micro
FROM __cells c
JOIN __mg m ON c.g = m.g
JOIN __mt t ON c.t = t.t
GROUP BY c.g"""


def psi_bins(
    df: DataFrame,
    value: Column | str,
    is_current: Column,
    bins: int = 10,
) -> DataFrame:
    """``bin, n_ref, n_cur, psi_micro`` — the Population Stability Index
    of a numeric column between a reference slice and a current slice
    (``is_current`` boolean), per equal-width bin over the GLOBAL
    min/max, in integer micro-nats.  PSI is the industry drift monitor
    for model inputs (rule of thumb: Σ < 0.1 stable, > 0.25 shifted);
    it differs from :func:`drift_kl` in being numeric-binned and
    symmetric in direction of flow:

        PSI = Σ_bins (aᵢ/A − eᵢ/E) · ln( (aᵢ·E) / (eᵢ·A) )

    Determinism: bin edges are integer width-bucket arithmetic over
    milli-quantized values (the zorder scaling device); every bin count
    gets +1 smoothing (documented industry practice for empty bins —
    without it an empty bin is ±∞) so the ln argument is a ratio of
    positive integers; each bin's term is quantized to micro-nats
    BEFORE the caller sums — int64 addition is associative, floats
    never accumulate.  Two shuffles total: the (bin, side) cell counts
    and the one-row min/max broadcast.

    Non-finite values (NaN/±Inf) are dropped on BOTH engines: Spark's
    non-ANSI bigint cast silently maps NaN→0 and Inf→Long.MaxValue
    (corrupting the global bin edges) while DuckDB raises — either
    behavior breaks the twin, so neither is allowed in.  Overflow
    envelope (same device as operators/zorder, tightened 1000× by the
    milli scaling): the binning multiply needs (vm range)·bins < 2⁶³,
    i.e. |value| spans up to ~9e14/bins after ×1000 — epoch-micros-
    sized columns must be pre-quantized coarser first."""
    if bins < 1:
        # bins=0 would silently degenerate to a single bin 0 with
        # psi_micro 0 — a drift monitor that never reports drift.
        raise ValueError("bins must be >= 1")
    vc = F.col(value) if isinstance(value, str) else value
    finite = vc.isNotNull() & ~F.isnan(vc) & (F.abs(vc) != float("inf"))
    vm = F.round(vc * 1000, 0).cast("bigint")
    base = df.select(
        F.when(finite, vm).alias("vm"),
        is_current.cast("boolean").alias("cur"),
    ).where(F.col("vm").isNotNull() & F.col("cur").isNotNull())
    rng = base.agg(F.min("vm").alias("__lo"), F.max("vm").alias("__hi"))
    binned = base.crossJoin(F.broadcast(rng)).select(
        F.expr(f"((vm - __lo) * {bins}) div (__hi - __lo + 1)").alias("bin"),
        "cur",
    )
    cells = binned.groupBy("bin").agg(
        (F.sum((~F.col("cur")).cast("long")) + 1).alias("n_ref"),
        (F.sum(F.col("cur").cast("long")) + 1).alias("n_cur"),
    )
    totals = cells.agg(
        F.sum("n_ref").alias("__a"), F.sum("n_cur").alias("__b")
    )
    term = (
        F.col("n_cur").cast("double") / F.col("__b")
        - F.col("n_ref").cast("double") / F.col("__a")
    ) * (
        F.log("n_cur") + F.log("__a") - F.log("n_ref") - F.log("__b")
    )
    return (
        cells.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            (F.col("n_ref") - 1).alias("n_ref"),
            (F.col("n_cur") - 1).alias("n_cur"),
            F.round(term * F.lit(1000000.0), 0).cast("bigint").alias(
                "psi_micro"
            ),
        )
        .orderBy("bin")
    )


def psi_bins_sql(
    table: str, value_expr: str, is_current_expr: str, bins: int = 10
) -> str:
    """DuckDB twin of :func:`psi_bins` — identical binning, smoothing,
    and micro-nat quantization."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    return f"""
WITH base AS MATERIALIZED (
  SELECT round(({value_expr}) * 1000, 0)::BIGINT AS vm,
         ({is_current_expr})::BOOLEAN AS cur
  FROM {table}
  WHERE ({value_expr}) IS NOT NULL AND isfinite({value_expr})
    AND ({is_current_expr}) IS NOT NULL
),
rng AS (SELECT min(vm) AS lo, max(vm) AS hi FROM base),
binned AS (
  SELECT ((vm - lo) * {bins}) // (hi - lo + 1) AS bin, cur
  FROM base, rng
),
cells AS (
  SELECT bin,
         (sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) + 1)::BIGINT AS n_ref,
         (sum(CASE WHEN cur THEN 1 ELSE 0 END) + 1)::BIGINT AS n_cur
  FROM binned GROUP BY bin
),
totals AS (SELECT sum(n_ref)::BIGINT AS a, sum(n_cur)::BIGINT AS b FROM cells)
SELECT bin, (n_ref - 1)::BIGINT AS n_ref, (n_cur - 1)::BIGINT AS n_cur,
       round((n_cur::DOUBLE / b - n_ref::DOUBLE / a)
             * (ln(n_cur) + ln(a) - ln(n_ref) - ln(b))
             * 1000000.0, 0)::BIGINT AS psi_micro
FROM cells, totals
ORDER BY bin
"""
