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

    # let-bind the tokenized array (the neardup.shingles idiom): four
    # occurrences below would each re-tokenize the document per row
    def _pairs(w):
        n = F.size(w)
        return F.arrays_zip(
            F.slice(w, 1, F.greatest(n - 1, F.lit(0))).alias("u"),
            F.slice(w, 2, F.greatest(n - 1, F.lit(0))).alias("v"),
        )

    pairs = F.element_at(F.transform(F.array(words), _pairs), 1)
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


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    class_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §4.3): within every language, rank documents by LM score and cut the
    ranking into ``n_buckets`` equal-depth tiers — CCNet keeps "head"
    (lowest perplexity) for pretraining and drops or down-weights "tail".

    Divergence from the paper, stated: CCNet scores with per-language
    Wikipedia-trained 5-gram KenLM models; here the model is the engine's
    self-trained corpus bigram LM (:func:`bigram_lm_score`) — ONE model,
    with the bucket windows per-language exactly as in CCNet.  Swapping
    in per-language external scores is a one-join change (the bucket
    stage only consumes ``(id, class, score)``).

    Shape: the LM scoring's two shuffles + one window over
    ``partitionBy(class) orderBy(nll_micro, id)`` — ntile is a single
    pass per partition and languages are few, so the window shuffle is
    one exchange on a low-cardinality key; the deterministic (score, id)
    order makes the tier split engine-exact.

    Returns ``id_col, class_col, n_bigrams, nll_micro, bucket, tier``
    (``bucket`` 1-based, ``tier`` = head/middle/tail when ``n_buckets``
    is 3, else ``b<k>``).  Docs with no bigrams are unscorable and
    omitted (the :func:`bigram_lm_score` contract).
    """
    from pyspark.sql.window import Window

    scored = bigram_lm_score(df, id_col=id_col, text_col=text_col)
    cls = df.select(F.col(id_col), F.col(class_col))
    w = Window.partitionBy(class_col).orderBy("nll_micro", id_col)
    ranked = (
        scored.join(cls, id_col)
        .withColumn("bucket", F.ntile(n_buckets).over(w))
    )
    if n_buckets == 3:
        tier = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    else:
        tier = F.concat(F.lit("b"), F.col("bucket").cast("string"))
    out = ranked.select(
        id_col, class_col, "n_bigrams", "nll_micro", "bucket", tier.alias("tier")
    )
    from scholarmind_spark.util import attach_caches

    return attach_caches(out, list(getattr(scored, "_sm_caches", ())))


def perplexity_buckets_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    class_col: str = "lang",
    n_buckets: int = 3,
) -> str:
    """DuckDB twin of :func:`perplexity_buckets`."""
    if n_buckets == 3:
        tier = (
            "CASE b.bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'"
            " ELSE 'tail' END"
        )
    else:
        tier = "'b' || b.bucket::VARCHAR"
    return f"""
WITH __lm AS ({bigram_lm_score_sql(table, id_col, text_col)}),
__b AS (
  SELECT s.{id_col}, c.{class_col}, s.n_bigrams, s.nll_micro,
         ntile({n_buckets}) OVER (PARTITION BY c.{class_col}
                                  ORDER BY s.nll_micro, s.{id_col}) AS bucket
  FROM __lm s JOIN {table} c ON s.{id_col} = c.{id_col}
)
SELECT b.{id_col}, b.{class_col}, b.n_bigrams, b.nll_micro, b.bucket,
       {tier} AS tier
FROM __b b
"""
