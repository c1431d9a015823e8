"""Benchmark decontamination: flag corpus documents that share word-k-gram
shingles with a (small) benchmark/eval set.

Training-data hygiene at 100 TB: the benchmark side is tiny by
construction (eval suites are thousands of documents, not billions), so
its distinct shingle set broadcasts and the corpus side streams through a
broadcast-hash semi-join — the corpus is scanned ONCE, never shuffled on
the shingle key.  Shingles ride as 60-bit md5-derived ints
(:func:`scholarmind_spark.operators.neardup.minhash_base`) so the probe
key is 8 bytes and the DuckDB oracle computes identical keys.

Reference parity: the reference has no decontamination operator; this is
part of the engine's LLM-pipeline extension surface (SURVEY §6 scope),
reusing the near-dup shingle machinery (neardup.py) for consistency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.neardup import (
    SHINGLE_K,
    minhash_base,
    minhash_base_sql,
    shingles,
    shingles_sql,
)


def decontamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    min_overlap: int = 2,
) -> DataFrame:
    """Per corpus document, the number of distinct k-gram shingles it
    shares with ANY benchmark document; rows with ``n_shared >=
    min_overlap`` (the contamination candidates to drop or review).
    Returns ``id, n_shared`` (unordered; gates/presentation callers
    sort their own bounded outputs)."""
    cand = corpus.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), k)).alias("s")
    ).select("id", minhash_base(F.col("s")).alias("sh"))
    bench = (
        benchmark.select(F.explode(shingles(F.col(text_col), k)).alias("s"))
        .select(minhash_base(F.col("s")).alias("sh"))
        .distinct()
    )
    return (
        cand.join(F.broadcast(bench), "sh")
        # shingles() is distinct per doc, so a plain count is a distinct count
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
        # no terminal orderBy (corpus-scale presentation sort); gates and
        # presentation callers order their own bounded outputs
    )


def decontamination_overlap_sql(
    corpus_sql: str,
    benchmark_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    min_overlap: int = 2,
) -> str:
    """DuckDB twin: identical shingling, hashing, and overlap count."""
    sh = shingles_sql(text_col, k)
    return f"""
WITH cand AS (
  SELECT {id_col} AS id, {minhash_base_sql('s')} AS sh
  FROM (SELECT {id_col}, unnest({sh}) AS s FROM ({corpus_sql}))
),
bench AS (
  SELECT DISTINCT {minhash_base_sql('s')} AS sh
  FROM (SELECT unnest({sh}) AS s FROM ({benchmark_sql}))
)
SELECT id, count(*) AS n_shared
FROM cand JOIN bench USING (sh)
GROUP BY id HAVING count(*) >= {min_overlap}
ORDER BY id
"""
