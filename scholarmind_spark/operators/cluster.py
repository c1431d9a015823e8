"""Near-duplicate clustering: pair list → connected components → survivor.

The near-dup operators emit PAIRS (``id_a, id_b, score``); an actual dedup
pipeline needs CLUSTERS (duplicate groups) and one survivor per cluster.
Transitivity matters: A~B and B~C puts A,B,C in one group even when A~C
scored under threshold.

Scale design — Pregel-style min-label propagation as a driver loop of
DataFrame joins (the standard Spark shape when a graph library isn't
warranted):

- labels start as each node's own id;
- each round every node takes ``min(own label, neighbors' labels)``
  (join edges→labels, groupBy(node).min with map-side partial agg);
- convergence when a round changes no label (checked with one tiny agg
  action per round — near-dup graphs have tiny diameter, so rounds ≈ 3-5).

Each round is one shuffle of the EDGE list on label-holder id.  At 100 TB
the pair list is orders of magnitude smaller than the corpus (it only
contains near-dups), so the loop runs on a relation that broadcast-joins
back to the corpus at the end.  Labels persist per round and the previous
round's cache is released eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.util import attach_caches as _attach_caches


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """``node, component`` for every node in ``pairs``; component = min node
    id reachable through the pair graph (deterministic canonical label)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .persist()
    )
    def _label_digest(lbl: DataFrame):
        # Fixpoint detector that works for ANY id type: per-node min labels
        # only change by decreasing, so the multiset of labels changes iff
        # some label changed; a sum of 64-bit label hashes (in decimal, so
        # no bigint overflow wrap) detects that with one cheap scalar agg
        # per round.  A plain sum(label) is null for string ids — and
        # null == null made the old check "converge" after one round.
        return lbl.agg(
            F.sum(F.xxhash64("label").cast("decimal(38,0)"))
        ).collect()[0][0]

    converged = False
    try:
        prev_sum = _label_digest(labels)
        for _ in range(max_iter):
            # neighbor labels: edge dst carries its current label to src
            neighbor = (
                edges.join(labels, edges.dst == labels.node)
                .select(F.col("src").alias("node"), "label")
            )
            new_labels = (
                labels.unionByName(neighbor)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .persist()
            )
            new_sum = _label_digest(new_labels)
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum
        if not converged:
            # surface instead of silently returning a partial labeling: a
            # graph with diameter > max_iter needs a bigger budget (or a
            # pointer-doubling variant), and the caller must know
            labels.unpersist()
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations; raise max_iter for this graph"
            )
        out = labels.select("node", F.col("label").alias("component"))
        # the final labels round was materialized by its convergence count;
        # the caller releases it via release_caches() after consuming `out`
        return _attach_caches(out, [labels])
    finally:
        edges.unpersist()


def dedup_survivors(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """``node, component, is_survivor`` — min-id per component survives
    (deterministic policy; a quality-score orderBy slots in the same
    min_by shape)."""
    cc = connected_components(pairs, id_a, id_b)
    out = cc.select(
        "node", "component", (F.col("node") == F.col("component")).alias("is_survivor")
    )
    # forward both the CC loop's cache and any caches the pair-producing
    # operator attached, so one release_caches() call frees the whole chain
    return _attach_caches(
        out, getattr(cc, "_sm_caches", []) + list(getattr(pairs, "_sm_caches", []))
    )


def connected_components_sql(pairs_sql: str, id_a: str = "id_a", id_b: str = "id_b") -> str:
    """DuckDB twin: min reachable id via a recursive CTE (UNION dedups the
    frontier, so the recursion terminates on cyclic graphs)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT {id_a} AS src, {id_b} AS dst FROM pairs
  UNION
  SELECT {id_b} AS src, {id_a} AS dst FROM pairs
),
walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.node
)
SELECT node, min(label) AS component FROM walk GROUP BY node
"""
