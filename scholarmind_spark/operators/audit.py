"""Referential-integrity audit: orphan counts across FK relationships.

Engine extension (SURVEY §2): the data-quality gate a warehouse runs
after every load — for each declared child→parent relationship, count
child rows whose foreign key has no matching parent (NULL keys are
counted separately, not as orphans, per SQL FK semantics).

Spark-first shape: each relationship is one LEFT ANTI join — Spark
broadcasts the parent's distinct key set when small and falls back to
a shuffled hash join otherwise (AQE decides from measured sizes, the
right behavior when `parent` is a 100-row region table one day and a
billion-row orders table the next).  The per-edge results are a
handful of scalar rows unioned together — no driver-side loop touches
row data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_integrity_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """``relationship, n_child, n_null_fk, n_orphans`` per declared edge
    ``(name, child_df, fk_col, parent_df, pk_col)``."""
    outs = []
    for name, child, fk, parent, pk in edges:
        keys = child.select(F.col(fk).alias("__fk"))
        nn = keys.filter(F.col("__fk").isNotNull())
        orphans = nn.join(
            parent.select(F.col(pk).alias("__fk")).distinct(),
            "__fk",
            "left_anti",
        )
        outs.append(
            keys.agg(
                F.lit(name).alias("relationship"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.col("__fk").isNull().cast("long")).alias("n_null_fk"),
            ).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            )
        )
    if not outs:
        raise ValueError("fk_integrity_audit needs at least one edge")
    return reduce(lambda a, b: a.unionByName(b), outs)


def fk_integrity_audit_sql(
    edges: list[tuple[str, str, str, str, str]],
) -> str:
    """DuckDB twin over table names:
    ``(name, child_table, fk_col, parent_table, pk_col)``."""
    parts = [
        f"""
SELECT '{name}' AS relationship,
       count(*)::BIGINT AS n_child,
       sum(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_fk,
       (SELECT count(*)::BIGINT FROM {child} c
        WHERE c.{fk} IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})
       ) AS n_orphans
FROM {child}"""
        for name, child, fk, parent, pk in edges
    ]
    if not parts:
        raise ValueError("fk_integrity_audit_sql needs at least one edge")
    return "\nUNION ALL\n".join(parts)


def fd_audit(
    df: DataFrame, lhs: str, rhs: str
) -> DataFrame:
    """Functional-dependency audit: does ``lhs`` determine ``rhs``?

    One row: distinct lhs count, how many lhs values map to more than
    one rhs (violations), the worst fan-out, and the exact violation
    per-mille — the schema-inference check behind "can I use this as a
    join key / dedup key / partition column".  ``lhs -> rhs`` holds
    iff ``n_violating = 0``.

    Two partial-aggregated shuffles: distinct (lhs, rhs) pairs, then a
    per-lhs rollup of the (much smaller) pair relation; the final row
    is a scalar aggregate.  NULL lhs rows are excluded (a null key
    determines nothing); NULL rhs counts as a value (lhs -> NULL-or-x
    is a real violation)."""
    pairs = (
        df.filter(F.col(lhs).isNotNull())
        .select(F.col(lhs).alias("l"), F.col(rhs).alias("r"))
        .distinct()
    )
    per_l = pairs.groupBy("l").agg(F.count("*").alias("fanout"))
    return per_l.agg(
        F.count("*").cast("bigint").alias("n_lhs"),
        F.sum((F.col("fanout") > 1).cast("long")).cast("bigint").alias(
            "n_violating"
        ),
        F.max("fanout").cast("bigint").alias("max_fanout"),
        F.expr(
            "(sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) * 1000"
            " + count(*) div 2) div count(*)"
        ).alias("violation_permille"),
    )


def fd_audit_sql(table: str, lhs: str, rhs: str) -> str:
    """DuckDB twin of :func:`fd_audit`."""
    return f"""
WITH __pairs AS (
  SELECT DISTINCT {lhs} AS l, {rhs} AS r FROM {table}
  WHERE {lhs} IS NOT NULL
),
__per_l AS (SELECT l, count(*)::BIGINT AS fanout FROM __pairs GROUP BY l)
SELECT count(*)::BIGINT AS n_lhs,
       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
       max(fanout)::BIGINT AS max_fanout,
       (sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT * 1000
        + count(*)::BIGINT // 2) // count(*)::BIGINT AS violation_permille
FROM __per_l"""


def benford_audit(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """First-significant-digit audit per group: ``grp, n, chi2_micro`` —
    the chi-square distance of the observed digit distribution from
    Benford's law, ``P(d) = log10(1 + 1/d)``.  The classic screen for
    fabricated or mechanically-generated numeric columns (naturally
    occurring multi-scale values follow Benford; uniform generators,
    capped counters, and hand-typed numbers do not).

    The statistic is a DIAGNOSTIC score, not a hypothesis test — rank
    groups by it and eyeball the top.  Determinism: per-digit terms
    ``(obs − n·L_d)² / (n·L_d)`` are each ONE fixed-order double
    expression of integer counts and the literal Benford constants,
    rounded to int64 micros before the 9-term sum (the repo's q_micro
    device); missing digits participate as obs = 0 via a digit-spine
    cross join (9 rows per group, broadcast).

    One shuffle for (group, digit) counts; everything after is
    proportional to groups x 9.  Zero/NULL values carry no leading
    significant digit and are excluded — as are values whose 9-decimal
    rendering has no significant digit at all (|v| < 5e-10, NaN, inf):
    their extraction yields a non-digit, so both engines drop them via an
    explicit ``d BETWEEN 1 AND 9`` guard *before* counting ``n`` (without
    the guard Spark silently counted them in ``n`` while DuckDB's
    ``::INT`` on ``''`` raised)."""
    # try_cast, not cast: under ANSI mode ''::INT (no significant digit
    # anywhere, e.g. |v| < 5e-10 or NaN) raises instead of yielding NULL
    first_digit = F.substring(
        F.regexp_replace(
            F.format_number(F.abs(F.col(value_col)).cast("double"), 9),
            r"[0.,]",
            "",
        ),
        1,
        1,
    ).try_cast("int")
    obs = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) != 0))
        .select(F.col(group_col).alias("g"), first_digit.alias("d"))
        .filter(F.col("d").between(1, 9))
        .groupBy("g", "d")
        .agg(F.count("*").alias("obs"))
    )
    spine = (
        obs.select("g")
        .distinct()
        .select("g", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"))
    )
    n_g = obs.groupBy("g").agg(F.sum("obs").alias("n"))
    exp = F.col("n") * (
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("d")) / F.log(F.lit(10.0))
    )
    term = F.round(
        (F.col("obs_f") - exp) * (F.col("obs_f") - exp) / exp * F.lit(1000000.0)
    ).cast("bigint")
    # eqNullSafe joins: a NULL group is a real audit bucket — plain
    # equi-joins silently dropped it from the output on both engines
    joined = spine.alias("s").join(
        obs.alias("o"),
        F.col("s.g").eqNullSafe(F.col("o.g")) & (F.col("s.d") == F.col("o.d")),
        "left",
    ).select(F.col("s.g").alias("g"), F.col("s.d").alias("d"), "obs")
    return (
        joined.alias("j")
        # no broadcast hint: n_g has one row per group — unbounded by
        # this API (AQE broadcasts it when actually small)
        .join(n_g.alias("t"), F.col("j.g").eqNullSafe(F.col("t.g")))
        .select(
            F.col("j.g").alias("g"),
            "n",
            "d",
            F.coalesce(F.col("obs"), F.lit(0)).cast("double").alias("obs_f"),
        )
        .select("g", "n", term.alias("__t"))
        .groupBy("g")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.sum("__t").alias("chi2_micro"),
        )
        .select(F.col("g").alias(group_col), "n", "chi2_micro")
    )


def benford_audit_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`benford_audit` (same digit extraction via
    a fixed 9-decimal rendering, same per-digit micro quantization)."""
    return f"""
WITH __obs AS (
  SELECT g, d, count(*)::BIGINT AS obs FROM (
    SELECT {group_col} AS g,
           TRY_CAST(substring(regexp_replace(format('{{:.9f}}', abs({value_col})::DOUBLE),
                                             '[0.,]', '', 'g'), 1, 1) AS INT) AS d
    FROM {table}
    WHERE {value_col} IS NOT NULL AND {value_col} <> 0
  ) WHERE d BETWEEN 1 AND 9 GROUP BY g, d
),
__spine AS (
  SELECT g, d FROM (SELECT DISTINCT g FROM __obs), unnest(range(1, 10)) AS u(d)
),
__n AS (SELECT g, sum(obs)::BIGINT AS n FROM __obs GROUP BY g)
SELECT s.g AS {group_col}, max(n.n) AS n,
       sum(round((coalesce(o.obs, 0)::DOUBLE - n.n * (ln(1.0 + 1.0 / s.d) / ln(10.0)))
                 * (coalesce(o.obs, 0)::DOUBLE - n.n * (ln(1.0 + 1.0 / s.d) / ln(10.0)))
                 / (n.n * (ln(1.0 + 1.0 / s.d) / ln(10.0)))
                 * 1000000.0)::BIGINT)::BIGINT AS chi2_micro
FROM __spine s
LEFT JOIN __obs o ON s.g IS NOT DISTINCT FROM o.g AND s.d = o.d
JOIN __n n ON s.g IS NOT DISTINCT FROM n.g
GROUP BY s.g"""


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """Re-identification risk audit: partition ``df`` into equivalence
    classes on the quasi-identifier columns and report how many records
    sit in classes smaller than ``k`` (Sweeney 2002 k-anonymity — a
    released dataset is k-anonymous iff every class has ≥ k members).

    Output: ``risk_rank, band, n_classes, n_records, pct_records`` —
    three bands (unique / below-k / at-least-k), pct over all rows,
    round(2).  ``risk_rank`` (1 = worst) pins the row order.

    Engine extension (SURVEY §2): the pre-release privacy gate a corpus
    publisher runs next to PII redaction (operators/pii) — redaction
    removes direct identifiers; this measures the joinable-QI risk that
    survives it.

    Spark-first shape, 100 TB posture: ONE shuffle — groupBy(QI) with
    map-side partial counts — then the banding runs on class-level rows
    (≤ #classes) and the totals are one-row aggregates broadcast back
    via crossJoin; no collect(), no second pass over the data.  NULL QI
    values form their own class (groupBy null-safe equality), matching
    the release semantics: rows with a suppressed QI cell are
    indistinguishable from each other, not from everything.
    """
    if not qi_cols:
        raise ValueError("k_anonymity_report needs at least one QI column")
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 bands every class anonymous)")
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("csize"))
    banded = classes.select(
        F.when(F.col("csize") == 1, F.lit(1))
        .when(F.col("csize") < k, F.lit(2))
        .otherwise(F.lit(3))
        .alias("risk_rank"),
        "csize",
    )
    per_band = banded.groupBy("risk_rank").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("csize").alias("n_records"),
    )
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        per_band.crossJoin(total)
        .select(
            "risk_rank",
            F.when(F.col("risk_rank") == 1, F.lit("unique (size=1)"))
            .when(F.col("risk_rank") == 2, F.lit(f"small (2<=size<{k})"))
            .otherwise(F.lit(f"anonymous (size>={k})"))
            .alias("band"),
            "n_classes",
            "n_records",
            F.round(
                F.lit(100) * F.col("n_records").cast("double")
                / F.col("__total"),
                2,
            ).alias("pct_records"),
        )
        .orderBy("risk_rank")
    )


def k_anonymity_report_sql(table: str, qi_exprs: list[str], k: int = 5) -> str:
    """DuckDB twin of :func:`k_anonymity_report` over QI expressions."""
    qi = ", ".join(qi_exprs)
    return f"""
WITH __classes AS (
  SELECT count(*)::BIGINT AS csize FROM {table} GROUP BY {qi}
),
__banded AS (
  SELECT CASE WHEN csize = 1 THEN 1 WHEN csize < {k} THEN 2 ELSE 3 END
           AS risk_rank,
         csize
  FROM __classes
),
__per AS (
  SELECT risk_rank, count(*)::BIGINT AS n_classes,
         sum(csize)::BIGINT AS n_records
  FROM __banded GROUP BY risk_rank
),
__tot AS (SELECT count(*)::BIGINT AS __total FROM {table})
SELECT risk_rank,
       CASE risk_rank WHEN 1 THEN 'unique (size=1)'
                      WHEN 2 THEN 'small (2<=size<{k})'
                      ELSE 'anonymous (size>={k})' END AS band,
       n_classes, n_records,
       round(100 * n_records::DOUBLE / __total, 2) AS pct_records
FROM __per, __tot ORDER BY risk_rank
"""


def contract_check(
    df: DataFrame, rules: list[tuple[str, "F.Column"]]
) -> DataFrame:
    """Data-contract validation: ``rule, n_rows, n_violations,
    violation_pct`` per declared rule — the post-load gate a warehouse
    runs against the producer's contract (types are the schema's job;
    this covers the VALUE constraints a schema can't express: ranges,
    enums, regex shapes, nullability).

    A row violates a rule when its predicate is NOT TRUE — so a NULL
    predicate (NULL input to a range check) counts as a violation,
    matching SQL CHECK-constraint intuition reversed: contracts demand
    provable conformance, and an unknown is not provable.  Rules that
    should exempt NULLs say so explicitly (``col.isNull() | pred``).

    Spark-first shape: ONE aggregate pass over the data computes every
    rule simultaneously (a conditional sum per rule — map-side partial,
    no shuffle beyond the single-row combine); per-rule rows are then
    unpivoted from that one result row via a literal stack, so adding a
    rule never adds a scan.
    """
    if not rules:
        raise ValueError("contract_check needs at least one rule")
    # coalesce: sum over ZERO rows is NULL on both engines — an empty
    # feed must read as "0 violations of 0 rows", not unknown
    sums = [F.count(F.lit(1)).alias("__n")] + [
        F.coalesce(
            F.sum((~pred.eqNullSafe(F.lit(True))).cast("long")), F.lit(0)
        ).alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    one = df.agg(*sums)
    # rule names pass through a SQL string literal (stack) — escape
    # embedded quotes so a name like "it's" neither breaks the parse
    # nor injects expression text
    stack = ", ".join(
        "'" + name.replace("'", "''") + f"', __v{i}"
        for i, (name, _) in enumerate(rules)
    )
    return (
        one.selectExpr(
            "__n", f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
        )
        .select(
            "rule",
            F.col("__n").alias("n_rows"),
            "n_violations",
            F.when(F.col("__n") > 0, F.round(
                F.lit(100) * F.col("n_violations").cast("double") / F.col("__n"),
                2,
            )).otherwise(F.lit(0.0)).alias("violation_pct"),
        )
        .orderBy("rule")
    )


def contract_check_sql(
    table: str, rules: list[tuple[str, str]]
) -> str:
    """DuckDB twin of :func:`contract_check` over SQL predicates."""
    if not rules:
        raise ValueError("contract_check needs at least one rule")
    sums = ", ".join(
        f"coalesce(sum(CASE WHEN ({pred}) IS NOT TRUE THEN 1 ELSE 0 END), 0)"
        f"::BIGINT AS __v{i}"
        for i, (_, pred) in enumerate(rules)
    )
    branches = " UNION ALL ".join(
        "SELECT '" + name.replace("'", "''") + "' AS rule, __n AS n_rows, "
        f"__v{i} AS n_violations FROM one"
        for i, (name, _) in enumerate(rules)
    )
    return f"""
WITH one AS (SELECT count(*)::BIGINT AS __n, {sums} FROM {table})
SELECT rule, n_rows, n_violations,
       CASE WHEN n_rows > 0
            THEN round(100 * n_violations::DOUBLE / n_rows, 2)
            ELSE 0.0 END AS violation_pct
FROM ({branches})
ORDER BY rule
"""
