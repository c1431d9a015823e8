"""Blocked fuzzy record linkage (edit-distance entity resolution).

Engine extension (SURVEY §2 — the reference normalizes journal keys
with exact lower/trim matching, src/core/data_processor.py D11; this
is the approximate companion): find string pairs within a small edit
distance without an all-pairs comparison.  Training-data uses: typo
/ variant detection across metadata keys (journal names, author
spellings, domain names), and query-side vocabulary correction.

Semantics (pinned, identical in the DuckDB oracle): emit ``a, b,
dist`` with ``a < b`` for distinct non-empty keys where

    levenshtein(a, b) <= max_dist
    AND abs(len(a) - len(b)) <= max_dist
    AND (first_char(a) = first_char(b) OR last_char(a) = last_char(b))

The first/last-char condition is the *blocking contract*, not an
implementation detail: pairs whose edits touch both the first and the
last character are out of scope (the standard recall tradeoff of
char-anchor blocking; tighten with q-gram prefix blocking if those
matter).

Spark-first shape, sized for web-scale key sets:

- each key emits 2 block rows (first-char family, last-char family);
  candidates come from two EQUI-joins — the length tolerance is folded
  into the join key by emitting ``len + k`` (k in 0..max_dist) on one
  side, so no inequality join and no all-pairs blow-up;
- block sizes are bounded by (alphabet x length) buckets; the skew
  risk is hot (char, len) buckets for short common keys — AQE's skew
  split handles those, and ``levenshtein(_, _, threshold)``-style
  early-exit is unnecessary because the length prefilter already ran
  inside the join key;
- the exact ``levenshtein`` runs only on candidates (JVM built-in,
  whole-stage codegen), then the two families are deduplicated with
  one ``distinct`` on the (a, b) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_link(
    df: DataFrame, key_col: str, max_dist: int = 2
) -> DataFrame:
    """``a, b, dist`` fuzzy self-linkage of the distinct values of
    ``key_col`` under the blocking contract above."""
    keys = (
        df.select(F.col(key_col).cast("string").alias("k"))
        .filter(F.col("k").isNotNull() & (F.col("k") != ""))
        .distinct()
        .select("k", F.length("k").alias("n"))
    )
    fams = keys.select(
        "k",
        "n",
        F.explode(
            F.array(
                F.struct(F.lit("f").alias("fam"), F.substring("k", 1, 1).alias("ch")),
                F.struct(F.lit("l").alias("fam"), F.expr("substring(k, -1, 1)").alias("ch")),
            )
        ).alias("b"),
    ).select("k", "n", F.col("b.fam").alias("fam"), F.col("b.ch").alias("ch"))
    # fold the ±max_dist length tolerance into the equi-join key: the
    # left side emits (len + k) for k in -max_dist..max_dist, the right
    # side its exact len — every pair with |la-lb| <= max_dist meets in
    # a (fam, ch, len) bucket regardless of which key the lexicographic
    # a < b orientation puts on the left.
    left = fams.select(
        F.col("k").alias("a"),
        F.col("n").alias("na"),
        "fam",
        "ch",
        F.explode(
            F.array(
                *[F.col("n") + F.lit(k) for k in range(-max_dist, max_dist + 1)]
            )
        ).alias("nb"),
    )
    right = fams.select(
        F.col("k").alias("b"), F.col("n").alias("nb"), "fam", "ch"
    )
    cand = (
        left.join(right, ["fam", "ch", "nb"])
        .filter(F.col("a") < F.col("b"))
        .filter(F.abs(F.col("na") - F.col("nb")) <= max_dist)
        .select("a", "b")
        .distinct()
    )
    return cand.select(
        "a", "b", F.levenshtein("a", "b").alias("dist")
    ).filter(F.col("dist") <= max_dist)


def fuzzy_link_sql(table: str, key_expr: str, max_dist: int = 2) -> str:
    """DuckDB twin of :func:`fuzzy_link` — the same pinned semantics as
    a brute-force pair scan (the oracle states the contract; the Spark
    side is the scalable plan).

    DIALECT LIMIT: DuckDB's ``levenshtein`` (and ``editdist3`` /
    ``damerau_levenshtein``) counts BYTES, Spark's counts CODE POINTS —
    ``levenshtein('日本語','日本酒')`` is 3 vs 1, ``('cafe','café')`` 2
    vs 1.  Spark's code-point semantics are the operator's contract
    (pinned by pytest); this twin is exact only over ASCII keys, and the
    correctness gate restricts its vocabulary accordingly on BOTH
    engines."""
    return f"""
WITH __k AS (
  SELECT DISTINCT {key_expr}::VARCHAR AS k FROM {table}
  WHERE {key_expr} IS NOT NULL AND {key_expr}::VARCHAR <> ''
)
SELECT x.k AS a, y.k AS b, levenshtein(x.k, y.k)::BIGINT AS dist
FROM __k x JOIN __k y ON x.k < y.k
WHERE abs(len(x.k) - len(y.k)) <= {max_dist}
  AND (substring(x.k, 1, 1) = substring(y.k, 1, 1)
       OR substring(x.k, -1, 1) = substring(y.k, -1, 1))
  AND levenshtein(x.k, y.k) <= {max_dist}"""
