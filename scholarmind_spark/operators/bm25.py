"""BM25 top-k corpus retrieval (Okapi BM25, Robertson & Zaragoza 2009).

Engine extension (the reference is a literature ETL tool with no search
surface, SURVEY §2): rank documents against a bag of query terms with
the standard BM25 weighting

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))
    idf(t)   = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

The training-data use cases: query-based corpus probes ("which documents
look like this benchmark prompt" — the lexical companion to the shingle
`decontam` operator), boilerplate/topic audits, and lightweight lexical
retrieval for RAG-style pipelines without an embedding index.

Spark-first shape:

- tokenization and term filtering are JVM expressions; the explode is
  filtered to the query terms BEFORE any shuffle, so the per-term
  relation is |docs containing a query term| rows, not corpus tokens;
- corpus-level scalars (N, avgdl) and the per-term document frequencies
  are one-row / |terms|-row aggregates broadcast into the scoring join;
- per-term scores are quantized to integer MICROS before the per-doc
  sum (the repo's ``q_micro`` device): float addition order across
  engines/partitions can differ in the last ulp, but summing int64
  micros is order-free, so the DuckDB twin matches bit-for-bit;
- top-k is ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
  (per-partition heaps + driver merge), never a single-task global sort.

At 100 TB: one corpus scan, one shuffle of the filtered term relation,
one shuffle of per-doc partial sums; everything else broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scholarmind_spark.operators.textstats import tokens, tokens_sql


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``id_col, score_micro, rank`` for the ``k`` highest-BM25 documents
    (score in integer millionths; ties broken by ascending id)."""
    terms = sorted({t.lower() for t in query_terms})
    words = F.transform(tokens(F.col(text_col)), F.lower)
    # persisted: the tokenized corpus feeds BOTH the stats aggregate and
    # the hits explode — without the cache the split/lower of every
    # document runs twice per action (the lm.py collocations pattern)
    # tokenize once per row (two sibling uses of `words` would each
    # re-run the transform), then take the length from the bound array
    base = df.select(
        F.col(id_col).alias("id"),
        words.alias("__w"),
    ).select("id", F.size("__w").alias("dl"), "__w").persist()
    # corpus scalars: one row, broadcast into the scoring join
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    hits = base.select(
        "id", "dl", F.explode("__w").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = hits.groupBy("id", "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("id").alias("dfreq"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5))
    )
    part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            F.round(idf * part * F.lit(1000000.0)).cast("bigint").alias("__micro"),
        )
    )
    top = (
        scored.groupBy("id")
        .agg(F.sum("__micro").alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score_micro"), F.asc("id"))
    # the window runs on the k surviving rows only — single tiny partition
    out = top.select(
        F.col("id").alias(id_col),
        "score_micro",
        F.row_number().over(w).cast("int").alias("rank"),
    )
    from scholarmind_spark.util import attach_caches

    return attach_caches(out, [base])


def bm25_topk_sql(
    table: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same tokens, same idf/tf math,
    same micro-int quantization and tie-breaks)."""
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty (IN () is not SQL)")
    # '' doubling: a term like "don't" must not break the generated SQL
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = f"list_transform({tokens_sql(text_col)}, t -> lower(t))"
    # every numeric literal is cast ::DOUBLE: DuckDB parses bare decimal
    # literals as DECIMAL and would run exact-decimal arithmetic where
    # Spark runs IEEE double — same ops, same operand types, same order
    idf = "ln(1.0::DOUBLE + (n_docs - dfreq + 0.5::DOUBLE) / (dfreq + 0.5::DOUBLE))"
    part = (
        f"(tf * {k1 + 1.0!r}::DOUBLE) / "
        f"(tf + {k1!r}::DOUBLE * ({1.0 - b!r}::DOUBLE + {b!r}::DOUBLE * dl / avgdl))"
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, len({toks}) AS dl, {toks} AS w FROM {table}
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base
),
hits AS (
  SELECT id, dl, unnest(w) AS term FROM base
),
tf AS (
  SELECT id, dl, term, count(*) AS tf FROM hits
  WHERE term IN ({in_list}) GROUP BY id, dl, term
),
dfreq AS (
  SELECT term, count(DISTINCT id) AS dfreq FROM tf GROUP BY term
),
scored AS (
  SELECT id, round({idf} * {part} * 1000000.0)::BIGINT AS micro
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
),
top AS (
  SELECT id, sum(micro)::BIGINT AS score_micro
  FROM scored GROUP BY id
  ORDER BY score_micro DESC, id ASC LIMIT {k}
)
SELECT id AS {id_col}, score_micro,
       row_number() OVER (ORDER BY score_micro DESC, id ASC)::INT AS rank
FROM top
"""
