"""Nearest-centroid (Rocchio) classification over an embedding column.

Engine extension (SURVEY §2 — no ML-adjacent surface in the
reference): assign every vector to the nearest per-label mean — the
standard cheap probe for "are my embedding clusters separable?",
label-noise auditing (rows whose own label loses to another class
centroid), and few-shot routing of new documents to curated buckets.

Exact cross-engine arithmetic (the repo's q_micro device): components
are quantized to integer MICRO units once; centroids are integer
means (``sum div n``); and the nearest-centroid argmin uses the
squared-distance expansion

    ||e - c||² = ||e||² - 2·e·c + ||c||²   →  argmin (||c||² - 2·e·c)

whose ``||e||²`` term is label-independent and dropped, leaving a
pure-int64 score.  Magnitudes: |component| ≤ ~1 → micro ≤ 1e6;
64-dim dot ≤ 64·1e12 ≪ 2⁶³.  Ties break to the smaller label.

Spark-first shape, sized for billions of vectors:

- the centroid table is (labels × dim) rows built with one partial-
  aggregated shuffle of the exploded (vec, dim) relation, then packed
  to (label, centroid-array, ||c||²) — K rows, broadcast;
- scoring is the bounded K-way cross join (the same deliberate
  BroadcastNestedLoopJoin shape as kmeans_assign_cells): each vector
  meets K centroid rows, the dot product runs JVM-side via
  ``zip_with``/``aggregate``, no per-dimension shuffle;
- the argmin is one window ``row_number`` per vector over K rows.

Reference parity: none (pure extension); complements
operators/kmeans.py (unsupervised codebooks) with the supervised dual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def centroid_classify(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """``id_col, label, pred_label, correct`` — nearest-centroid
    assignment of every vector; centroids are the per-label integer
    micro means of the same table."""
    q = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.transform(
            # double BEFORE multiply: float32 `v * 1e6` rounds in 24-bit
            # precision while DuckDB promotes to double (same latent
            # boundary bug fixed in operators/quantize.py)
            F.col(vec_col),
            lambda v: F.round(v.cast("double") * MICRO).cast("long"),
        ).alias("e"),
    )
    comp = q.select(
        "label", F.posexplode("e").alias("j", "v")
    )
    cent = (
        comp.groupBy("label", "j")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .select("label", "j", F.expr("s div n").alias("c"))
    )
    packed = (
        cent.groupBy(F.col("label").alias("clabel"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "c"))),
                lambda x: x["c"],
            ).alias("carr")
        )
        .select(
            "clabel",
            "carr",
            F.aggregate(
                "carr", F.lit(0).cast("long"), lambda acc, c: acc + c * c
            ).alias("c2"),
        )
    )
    scored = q.crossJoin(F.broadcast(packed)).select(
        "id",
        "label",
        "clabel",
        (
            F.col("c2")
            - F.lit(2)
            * F.aggregate(
                F.zip_with("e", "carr", lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, p: acc + p,
            )
        ).alias("d"),
    )
    w = Window.partitionBy("id").orderBy("d", "clabel")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("id").alias(id_col),
            "label",
            F.col("clabel").alias("pred_label"),
            (F.col("label") == F.col("clabel")).alias("correct"),
        )
    )


def centroid_classify_sql(
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> str:
    """DuckDB twin of :func:`centroid_classify` in explode-join form
    (the oracle states the semantics; Spark runs the broadcast plan)."""
    return f"""
WITH __q AS MATERIALIZED (
  SELECT {id_col} AS id, {label_col} AS label,
         list_transform({vec_col}, v -> round(v::DOUBLE * {MICRO})::BIGINT) AS e
  FROM {table}
),
__comp AS (
  SELECT label, i.i AS j, e[i.i] AS v
  FROM __q, unnest(range(1, len(e) + 1)) AS i(i)
),
__cent AS (
  SELECT label AS clabel, j, sum(v)::BIGINT // count(*)::BIGINT AS c
  FROM __comp GROUP BY label, j
),
__c2 AS (
  SELECT clabel, sum(c * c)::BIGINT AS c2 FROM __cent GROUP BY clabel
),
__dots AS (
  SELECT q.id, q.label, c.clabel, sum(q.e[c.j] * c.c)::BIGINT AS dot
  FROM __q q JOIN __cent c ON TRUE
  GROUP BY q.id, q.label, c.clabel
),
__scored AS (
  SELECT d.id, d.label, d.clabel, (c2.c2 - 2 * d.dot) AS d
  FROM __dots d JOIN __c2 c2 ON d.clabel = c2.clabel
)
SELECT id AS {id_col}, label, clabel AS pred_label,
       (label = clabel) AS correct
FROM __scored
QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, clabel) = 1"""
