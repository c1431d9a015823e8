"""Bigram language-model quality scoring (CCNet-style LM filtering).

Engine extension (SURVEY §2 — the reference has no corpus-quality
surface): train an add-one-smoothed bigram LM on a corpus in one pass,
then score each document by its average per-token negative
log-likelihood.  This is the classic CCNet / Wikipedia-LM quality
signal (Wenzek et al. 2020): fluent text scores low, boilerplate and
gibberish score high — the model-based companion to the heuristic
``text_quality_stats`` and ``char_entropy`` signals.

    P(v|u)   = (C(u,v) + 1) / (C(u) + V)          Laplace smoothing
    nll(doc) = mean over bigrams of  -ln P(v|u)

Cross-engine exact via the repo's q_micro device: each bigram's
``ln(C(u)+V) - ln(C(u,v)+1)`` is quantized to int64 micro-nats BEFORE
the per-doc sum (int64 addition is order-free; float addition order
across engines/partitions is not), and the mean is taken in pinned
integer arithmetic ``(s + n div 2) div n``.

Spark-first shape, sized for 100 TB:

- bigram extraction is pure array expressions (slice + arrays_zip),
  zero Python, no shuffle before the count;
- the model is two partial-aggregated shuffles (bigram counts, unigram
  counts) over the corpus bigram relation — linear in corpus tokens;
- scoring left-joins the doc bigrams to the model tables; the
  smoothing fallbacks (unseen bigram → C=0, unseen unigram → C=0)
  make the model reusable on held-out corpora, and Spark/AQE picks
  broadcast vs shuffle join by the measured model size (web-scale
  vocab ~1e7 rows is still broadcastable; the bigram table is not —
  it hash-joins on the same key the counts were aggregated on);
- docs with fewer than two tokens have no bigrams and are omitted
  (no likelihood is defined for them).

Reference parity: none (pure extension); the per-source quality gates
it feeds mirror the reference's abstract-notnull/validity filters
(src/core/data_processor.py) at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.textstats import tokens, tokens_sql


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    words = F.transform(tokens(F.col(text_col)), F.lower)
    n = F.size(words)
    pairs = F.arrays_zip(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))).alias("u"),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))).alias("v"),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("p"))
        .select("id", F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .filter((F.col("u") != "") & (F.col("v") != ""))
    )


def bigram_lm_score(
    df: DataFrame,
    train_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``id_col, n_bigrams, nll_micro`` — average per-bigram negative
    log-likelihood in integer micro-nats under an add-one bigram LM
    trained on ``train_df`` (default: ``df`` itself)."""
    doc_bi = _doc_bigrams(df, id_col, text_col)
    train_bi = (
        doc_bi if train_df is None else _doc_bigrams(train_df, id_col, text_col)
    )
    # the bigram relation feeds four consumers (bigram counts, unigram
    # counts, vocab, scoring join) — persist it so the corpus is scanned
    # and tokenized once, not four times; caller releases via
    # util.release_caches (or relies on LRU/ContextCleaner)
    doc_bi = doc_bi.persist()
    train_bi = doc_bi if train_df is None else train_bi.persist()
    big = train_bi.groupBy("u", "v").agg(F.count("*").alias("c_uv"))
    uni = train_bi.groupBy("u").agg(F.count("*").alias("c_u"))
    vocab = (
        train_bi.select(F.col("u").alias("w"))
        .unionByName(train_bi.select(F.col("v").alias("w")))
        .agg(F.countDistinct("w").alias("__vocab"))
    )
    term_micro = F.round(
        (
            F.log(F.coalesce(F.col("c_u"), F.lit(0)) + F.col("__vocab"))
            - F.log(F.coalesce(F.col("c_uv"), F.lit(0)) + F.lit(1))
        )
        * F.lit(1000000.0)
    ).cast("bigint")
    scored = (
        doc_bi.join(big, ["u", "v"], "left")
        .join(uni, ["u"], "left")
        .crossJoin(F.broadcast(vocab))
        .select("id", term_micro.alias("__t"))
        .groupBy("id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("__t").alias("__s"))
    )
    out = scored.select(
        F.col("id").alias(id_col),
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        F.expr("(__s + n_bigrams div 2) div n_bigrams").alias("nll_micro"),
    )
    from scholarmind_spark.util import attach_caches

    caches = [doc_bi] if train_bi is doc_bi else [doc_bi, train_bi]
    return attach_caches(out, caches)


def _doc_bigrams_sql(table: str, id_expr: str, text_expr: str) -> str:
    toks = f"list_transform({tokens_sql(text_expr)}, w -> lower(w))"
    return f"""
  SELECT id, p[1] AS u, p[2] AS v FROM (
    SELECT id, unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS p
    FROM (SELECT {id_expr} AS id, {toks} AS ws FROM {table})
  )
  WHERE p[1] <> '' AND p[2] <> ''"""


def bigram_lm_score_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`bigram_lm_score` (self-trained form); every
    aggregate cast ``::BIGINT`` (DuckDB sum → HUGEINT)."""
    return f"""
WITH __bi AS MATERIALIZED ({_doc_bigrams_sql(table, id_col, text_col)}),
__big AS (SELECT u, v, count(*)::BIGINT AS c_uv FROM __bi GROUP BY u, v),
__uni AS (SELECT u, count(*)::BIGINT AS c_u FROM __bi GROUP BY u),
__vocab AS (
  SELECT count(DISTINCT w)::BIGINT AS vocab
  FROM (SELECT u AS w FROM __bi UNION ALL SELECT v FROM __bi)
),
__scored AS (
  SELECT b.id,
         count(*)::BIGINT AS n_bigrams,
         sum(round((ln(coalesce(n.c_u, 0) + (SELECT vocab FROM __vocab))
                    - ln(coalesce(g.c_uv, 0) + 1))
                   * 1000000.0)::BIGINT)::BIGINT AS s_micro
  FROM __bi b
  LEFT JOIN __big g ON b.u = g.u AND b.v = g.v
  LEFT JOIN __uni n ON b.u = n.u
  GROUP BY b.id
)
SELECT id AS {id_col}, n_bigrams,
       (s_micro + n_bigrams // 2) // n_bigrams AS nll_micro
FROM __scored"""


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """``u, v, c_uv, pmi_micro`` — the ``k`` strongest bigram
    collocations by pointwise mutual information,

        PMI(u,v) = ln( c_uv · T / (c_u⋅ · c⋅ᵥ) )

    with T the total bigram count, c_u⋅ / c⋅ᵥ the positional margins.
    The classic phrase-discovery signal (Church & Hanks 1990) for
    tokenizer merge candidates and corpus phrase inventories.

    The q_micro device again: PMI is one fixed-order float expression
    of four INTEGER counts, rounded once to micro-nats — nothing
    accumulates in floats.  ``min_count`` kills the low-frequency
    PMI explosion (hapax pairs otherwise always win).

    One shuffle for bigram counts; the margins re-aggregate the
    (much smaller) count relation; top-k via TakeOrderedAndProject."""
    bi = _doc_bigrams(df, id_col, text_col)
    counts = bi.groupBy("u", "v").agg(F.count("*").alias("c_uv")).persist()
    left = counts.groupBy("u").agg(F.sum("c_uv").alias("c_u"))
    right = counts.groupBy("v").agg(F.sum("c_uv").alias("c_v"))
    total = counts.agg(F.sum("c_uv").alias("__t"))
    pmi = F.round(
        (
            F.log(F.col("c_uv").cast("double"))
            + F.log(F.col("__t").cast("double"))
            - F.log(F.col("c_u").cast("double"))
            - F.log(F.col("c_v").cast("double"))
        )
        * F.lit(1000000.0)
    ).cast("bigint")
    out = (
        counts.filter(F.col("c_uv") >= min_count)
        # NO broadcast hint on the margins: left/right have one row per
        # distinct token — vocabulary-sized, unbounded in the data (a web
        # corpus reaches 1e8+ tokens with junk/URLs).  AQE broadcasts them
        # when they are actually small; the hint forced a driver collect.
        .join(left, "u")
        .join(right, "v")
        .crossJoin(F.broadcast(total))
        .select("u", "v", "c_uv", pmi.alias("pmi_micro"))
        .orderBy(F.desc("pmi_micro"), F.asc("u"), F.asc("v"))
        .limit(k)
    )
    from scholarmind_spark.util import attach_caches

    return attach_caches(out, [counts])


def collocations_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> str:
    """DuckDB twin of :func:`collocations`."""
    return f"""
WITH __bi AS MATERIALIZED ({_doc_bigrams_sql(table, id_col, text_col)}),
__counts AS MATERIALIZED (
  SELECT u, v, count(*)::BIGINT AS c_uv FROM __bi GROUP BY u, v
),
__left AS (SELECT u, sum(c_uv)::BIGINT AS c_u FROM __counts GROUP BY u),
__right AS (SELECT v, sum(c_uv)::BIGINT AS c_v FROM __counts GROUP BY v),
__tot AS (SELECT sum(c_uv)::BIGINT AS t FROM __counts)
SELECT c.u, c.v, c.c_uv,
       round((ln(c.c_uv::DOUBLE) + ln((SELECT t FROM __tot)::DOUBLE)
              - ln(l.c_u::DOUBLE) - ln(r.c_v::DOUBLE))
             * 1000000.0)::BIGINT AS pmi_micro
FROM __counts c
JOIN __left l ON c.u = l.u
JOIN __right r ON c.v = r.v
WHERE c.c_uv >= {min_count}
ORDER BY pmi_micro DESC, c.u, c.v
LIMIT {k}"""
