"""Feature-hashing text featurizer (the "hashing trick", Weinberger et
al., "Feature Hashing for Large Scale Multitask Learning", ICML 2009).

Maps each document's token counts into a fixed number of hash buckets
with a hash-derived sign (the sign debiases collisions: colliding tokens
add with random ±1, so E[collision noise] = 0), then L2-normalizes.
This is the model-free featurizer of large-scale pipelines — no
vocabulary to build, no state to ship, deterministic on any engine —
and its output feeds the vector operators (ANN, embedding near-dup,
k-means) when no learned embeddings exist.

Output is SPARSE ``(id, bucket, tf_signed, value)`` triples: at 100 TB a
dense ``dim``-array per row materializes mostly zeros through every
shuffle, while the sparse form is exactly the relation the downstream
joins want (and the DuckDB twin stays plain SQL).  Dense conversion is a
presentation step (``groupBy(id).pivot`` or ``map_from_entries``) for
the consumer that needs it.

One corpus scan → explode tokens → two map-side-combining aggregates;
the hash is the same md5-based 60-bit integer every sampler in this
repo uses — no RNG, no seed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.neardup import minhash_base
from scholarmind_spark.operators.textstats import tokens, tokens_sql


def hash_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """``id_col, bucket, tf_signed, value`` sparse signed-TF features,
    L2-normalized per document (``value = tf_signed / ||doc||``, rounded
    to 6 decimals); buckets with a zero signed count are dropped."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(tokens(F.col(text_col)), F.lower)).alias("t"),
    )
    h = minhash_base(F.col("t"))
    # sign from the hash bit just above the bucket bits ((h mod 2dim) < dim
    # ⟺ that bit is 0 for power-of-2 dim) — integer-exact on a 60-bit
    # hash, where a float floor-division would lose precision past 2^53
    signed = tok.select(
        "id",
        (h % dim).cast("bigint").alias("bucket"),
        F.when((h % (2 * dim)) < dim, F.lit(1)).otherwise(F.lit(-1)).alias("s"),
    )
    per_bucket = (
        signed.groupBy("id", "bucket")
        .agg(F.sum("s").cast("bigint").alias("tf_signed"))
        .filter(F.col("tf_signed") != 0)
    )
    norm = per_bucket.groupBy("id").agg(
        F.sqrt(F.sum(F.col("tf_signed") * F.col("tf_signed"))).alias("__norm")
    )
    return (
        per_bucket.join(norm, "id")
        .select(
            F.col("id").alias(id_col),
            "bucket",
            "tf_signed",
            F.round(F.col("tf_signed") / F.col("__norm"), 6).alias("value"),
        )
    )


def hash_features_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`hash_features` (same 60-bit md5 hash, same
    bucket/sign split, same L2 normalization)."""
    h = f"(('0x' || substring(md5(t), 1, 15))::BIGINT)"
    return f"""
WITH tok AS (
  SELECT {id_col} AS id,
         unnest(list_transform({tokens_sql(text_col)}, x -> lower(x))) AS t
  FROM {table}
),
signed AS (
  SELECT id, ({h} % {dim})::BIGINT AS bucket,
         CASE WHEN ({h} % {2 * dim}) < {dim} THEN 1 ELSE -1 END AS s
  FROM tok
),
per_bucket AS (
  SELECT id, bucket, sum(s)::BIGINT AS tf_signed
  FROM signed GROUP BY id, bucket HAVING sum(s) <> 0
),
norm AS (
  SELECT id, sqrt(sum(tf_signed * tf_signed)) AS nrm FROM per_bucket GROUP BY id
)
SELECT p.id AS {id_col}, p.bucket, p.tf_signed,
       round(p.tf_signed / n.nrm, 6) AS value
FROM per_bucket p JOIN norm n ON p.id = n.id
"""
