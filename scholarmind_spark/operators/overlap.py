"""Cross-source vocabulary overlap: exact Jaccard counts per group pair.

Engine extension (SURVEY §2): quantify how much two corpus slices
(sources, languages, snapshots) share vocabulary — the signal that
drives dataset-mixture design (near-duplicate sources waste mixture
weight) and domain-shift monitoring between crawl batches.

Output is EXACT integer counts (``n_a, n_b, n_inter, n_union``) per
unordered group pair, never a float ratio: the caller divides at
presentation time, and no rounding can cross an engine.
``n_union`` comes from inclusion-exclusion, so only the intersection
is ever joined.

Spark-first shape, sized for thousands of groups x web-scale vocab:

- one scan builds the distinct (group, token) relation with map-side
  partial aggregation;
- per-group sizes are a tiny aggregate; the pair intersection is a
  self-equi-join ON TOKEN — the join key is the high-cardinality
  side, so it hash-partitions evenly (grouping by pair AFTER the
  join keeps no token string in the shuffle key);
- ``a < b`` orients pairs once, halving the join output.

The quadratic-in-groups pair space is real but intentional: the
operator targets group counts in the 10s-1000s (sources, languages),
where the bottleneck is the single vocab scan, not the pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.textstats import tokens, tokens_sql


def vocab_overlap(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """``a, b, n_a, n_b, n_inter, n_union`` for every unordered pair of
    ``group_col`` values (groups with disjoint vocabularies included,
    ``n_inter = 0``)."""
    gt = (
        df.select(
            F.col(group_col).alias("g"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("t"),
        )
        .filter(F.col("t") != "")
        .distinct()
    )
    sizes = gt.groupBy("g").agg(F.count("*").alias("n"))
    inter = (
        gt.alias("x")
        .join(gt.alias("y"), "t")
        .filter(F.col("x.g") < F.col("y.g"))
        .groupBy(F.col("x.g").alias("a"), F.col("y.g").alias("b"))
        .agg(F.count("*").alias("n_inter"))
    )
    pairs = (
        sizes.alias("sa")
        .crossJoin(sizes.alias("sb"))
        .filter(F.col("sa.g") < F.col("sb.g"))
        .select(
            F.col("sa.g").alias("a"),
            F.col("sb.g").alias("b"),
            F.col("sa.n").alias("n_a"),
            F.col("sb.n").alias("n_b"),
        )
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .select(
            "a",
            "b",
            "n_a",
            "n_b",
            F.coalesce("n_inter", F.lit(0)).alias("n_inter"),
            (
                F.col("n_a") + F.col("n_b") - F.coalesce("n_inter", F.lit(0))
            ).alias("n_union"),
        )
    )


def vocab_overlap_sql(
    table: str, group_col: str = "source", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`vocab_overlap`."""
    return f"""
WITH __gt AS MATERIALIZED (
  SELECT DISTINCT {group_col} AS g, t FROM (
    SELECT {group_col}, unnest({tokens_sql(f"lower({text_col})")}) AS t
    FROM {table}
  ) WHERE t <> ''
),
__sizes AS (SELECT g, count(*)::BIGINT AS n FROM __gt GROUP BY g),
__inter AS (
  SELECT x.g AS a, y.g AS b, count(*)::BIGINT AS n_inter
  FROM __gt x JOIN __gt y ON x.t = y.t AND x.g < y.g
  GROUP BY x.g, y.g
)
SELECT sa.g AS a, sb.g AS b, sa.n AS n_a, sb.n AS n_b,
       coalesce(i.n_inter, 0) AS n_inter,
       (sa.n + sb.n - coalesce(i.n_inter, 0)) AS n_union
FROM __sizes sa
JOIN __sizes sb ON sa.g < sb.g
LEFT JOIN __inter i ON i.a = sa.g AND i.b = sb.g"""
