"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023).  The published recipe for picking pretraining documents
that LOOK LIKE a target corpus (Wikipedia+books in the paper) out of a
raw crawl, without training a model:

1. featurize every document as a hashed bag of unigrams+bigrams
   (m buckets — the paper uses m = 10k hashed n-gram buckets);
2. fit two bag-of-buckets distributions: p(b) on the TARGET corpus and
   q(b) on the RAW corpus (add-one smoothed);
3. per raw document, the log importance weight is
   ``Σ_features log p(b) − log q(b)``;
4. select k documents by GUMBEL TOP-K over the log weights — sampling
   without replacement proportionally to the importance weight, the
   paper's resampling step.

Spark-first shape (everything linear, nothing iterative):

- featurization is a projection (tokens → unigrams+bigrams → md5 hash
  bucket, the engine-portable ``sampling.hash_bucket`` device);
- each distribution is ONE explode+groupBy histogram (map-side partial
  aggregation → the shuffle is m-bounded, never corpus-bounded);
- the log-ratio table is the FULL OUTER merge of the two histograms —
  at most m rows, broadcast to the scoring join;
- scoring is one feature→ratio join + per-document sum;
- selection is one ORDER BY + LIMIT over per-document scalars (Spark
  plans TakeOrderedAndProject — no full sort materialization).

Engine-exact arithmetic: per-bucket log ratios are rounded to integer
micro-nats BEFORE the per-document sum (the ``operators/lm.py``
discipline), so Spark and DuckDB agree bit-for-bit.  The Gumbel noise
is deterministic — ``u = (hash_bucket(id) + 0.5) / N``,
``g = −ln(−ln(u))`` — so the "random" resample is reproducible under
any partitioning, any engine, any cluster size (the same reason
``sampling.py`` derives every decision from a key hash: at 100 TB an
unseeded sample cannot be audited or incrementally rebuilt).

Relation to neighbours: the NB classifier (``nbquality.py``) filters by
a LEARNED keep/drop boundary; CCNet buckets (``lm.py``) rank by target-
LM perplexity; DSIR SELECTS a fixed budget matching a target
DISTRIBUTION — the three standard, complementary curation recipes.

Reference parity note: the upstream reference (ScholarMind) has no data
selection of any kind — this extends the engine for LLM-training-data
curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.neardup import minhash_base
from scholarmind_spark.operators.sampling import N_BUCKETS
from scholarmind_spark.operators.textstats import tokens, tokens_sql

DSIR_BUCKETS = 10_000  # the paper's hashed-feature dimensionality


def _features(df: DataFrame, id_col: str, text_col: str, m: int) -> DataFrame:
    """(id, b) — one row per unigram/bigram occurrence, hashed to
    [0, m).  Bigrams join adjacent lowercased tokens with one space."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)

    # let-bind the tokenized array (the neardup.shingles idiom): the
    # expression appears 5× below, and without binding each occurrence
    # re-tokenizes the document per row
    def _grams(t):
        return F.concat(
            t,
            F.when(F.size(t) >= 2,
                   F.zip_with(F.slice(t, 1, F.size(t) - 1),
                              F.slice(t, 2, F.size(t) - 1),
                              lambda a, b: F.concat(a, F.lit(" "), b))
                   ).otherwise(F.array().cast("array<string>")),
        )

    grams = F.element_at(F.transform(F.array(toks), _grams), 1)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .filter(F.col("g") != "")
        .select("id", (minhash_base(F.col("g")) % m).alias("b"))
    )


def _features_sql(table: str, id_col: str, text_col: str, m: int) -> str:
    toks = f"list_transform({tokens_sql(text_col)}, w -> lower(w))"
    grams = (
        f"list_concat({toks}, list_transform(range(1, len({toks})),"
        f" i -> {toks}[i] || ' ' || {toks}[i+1]))"
    )
    h = f"(('0x' || substring(md5(g), 1, 15))::BIGINT % {m})"
    return f"""
(SELECT id, {h} AS b FROM (
   SELECT {id_col} AS id, unnest({grams}) AS g FROM {table}
 ) WHERE g <> '')"""


def dsir_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = DSIR_BUCKETS,
) -> DataFrame:
    """Public handle on the hashed ``(id, b)`` feature relation, so a
    caller scoring the same corpus the ratios were fit on can compute
    (and persist) the raw-side pass ONCE and share it between
    :func:`dsir_bucket_logratio` and :func:`dsir_score` — the relation
    is one (8+8)-byte row per gram occurrence, the natural
    materialization point (far smaller than the text it derives from)."""
    return _features(df, id_col, text_col, m)


def dsir_bucket_logratio(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = DSIR_BUCKETS,
    raw_feats: DataFrame | None = None,
) -> DataFrame:
    """``(b, lr_micro)`` — per-bucket integer micro-nat log importance
    ratio ``ln p_target(b) − ln p_raw(b)`` (add-one smoothed over m
    buckets), the full-outer merge of the two m-bounded histograms.

    ``raw_feats``: optional precomputed :func:`dsir_features` relation
    for ``raw`` (value-identical by construction); pass the caller's
    persisted copy to fold the raw tokenization pass into one."""
    th = _features(target, id_col, text_col, m).groupBy("b").agg(
        F.count("*").alias("ct")
    )
    rf = (
        raw_feats
        if raw_feats is not None
        else _features(raw, id_col, text_col, m)
    )
    rh = rf.groupBy("b").agg(F.count("*").alias("cr"))
    tt = th.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("T"))
    rt = rh.agg(F.coalesce(F.sum("cr"), F.lit(0)).alias("R"))
    return (
        th.join(rh, "b", "full")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            F.round(
                (
                    F.log(F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    - F.log(F.col("T") + F.lit(m))
                    - F.log(F.coalesce(F.col("cr"), F.lit(0)) + 1)
                    + F.log(F.col("R") + F.lit(m))
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("lr_micro"),
        )
    )


def dsir_score(
    df: DataFrame,
    ratios: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = DSIR_BUCKETS,
    feats: DataFrame | None = None,
) -> DataFrame:
    """``id_col, n_feats, dsir_micro`` — per-document summed log
    importance weight in micro-nats.  Features absent from BOTH
    histograms cannot occur when scoring the raw corpus the ratios were
    fit on; a foreign corpus's unseen buckets coalesce to 0 (the
    smoothed ratio of two never-seen counts is ≈ ln((R+m)/(T+m)) ≠ 0 in
    general, but an unseen bucket carries no evidence either way — 0 is
    the standard OOV neutrality choice and keeps the gate math exact).
    Documents with zero features are omitted (no weight is defined).

    ``feats``: optional precomputed :func:`dsir_features` relation for
    ``df`` (value-identical by construction); see dsir_bucket_logratio."""
    feats = feats if feats is not None else _features(df, id_col, text_col, m)
    return (
        feats.join(ratios, "b", "left")
        .select("id", F.coalesce(F.col("lr_micro"), F.lit(0)).alias("__t"))
        .groupBy("id")
        .agg(F.count("*").alias("n_feats"), F.sum("__t").alias("dsir_micro"))
        .select(
            F.col("id").alias(id_col),
            F.col("n_feats").cast("bigint").alias("n_feats"),
            F.col("dsir_micro").cast("bigint").alias("dsir_micro"),
        )
    )


def _gumbel(id_expr: Column) -> Column:
    """Deterministic Gumbel(0,1) draw from the id hash: u strictly
    inside (0,1) via the +0.5 half-open shift, g = −ln(−ln u)."""
    u = (minhash_base(id_expr.cast("string")) % N_BUCKETS + F.lit(0.5)) / F.lit(
        float(N_BUCKETS)
    )
    return -F.log(-F.log(u))


def dsir_select(
    scores: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel top-k resample over the scored corpus: rank by
    ``dsir_micro / 1e6 + g(id)`` — a without-replacement sample
    distributed ∝ importance weight (the Gumbel-max trick), fully
    deterministic via the hash-derived Gumbel.  Adds ``gkey`` (rounded
    6 for presentation) and keeps the k best; one TakeOrderedAndProject,
    no full shuffle sort."""
    gkey = F.col("dsir_micro") / F.lit(1000000.0) + _gumbel(F.col(id_col))
    return (
        scores.withColumn("gkey", F.round(gkey, 6))
        .orderBy(F.desc("gkey"), id_col)
        .limit(k)
    )


def dsir_logratio_sql(
    raw_table: str,
    target_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = DSIR_BUCKETS,
) -> str:
    """DuckDB twin of :func:`dsir_bucket_logratio`."""
    tf = _features_sql(target_table, id_col, text_col, m)
    rf = _features_sql(raw_table, id_col, text_col, m)
    return f"""
(WITH th AS (SELECT b, count(*)::BIGINT AS ct FROM {tf} GROUP BY b),
     rh AS (SELECT b, count(*)::BIGINT AS cr FROM {rf} GROUP BY b),
     tt AS (SELECT coalesce(sum(ct), 0)::BIGINT AS T FROM th),
     rt AS (SELECT coalesce(sum(cr), 0)::BIGINT AS R FROM rh)
 SELECT coalesce(th.b, rh.b) AS b,
        round((ln(coalesce(ct, 0) + 1) - ln(T + {m})
             - ln(coalesce(cr, 0) + 1) + ln(R + {m})) * 1000000.0)::BIGINT
          AS lr_micro
 FROM th FULL JOIN rh ON th.b = rh.b
 CROSS JOIN tt CROSS JOIN rt)"""


def dsir_score_sql(
    table: str,
    ratios_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = DSIR_BUCKETS,
) -> str:
    """DuckDB twin of :func:`dsir_score`."""
    feats = _features_sql(table, id_col, text_col, m)
    return f"""
(SELECT f.id AS {id_col},
        count(*)::BIGINT AS n_feats,
        sum(coalesce(r.lr_micro, 0))::BIGINT AS dsir_micro
 FROM {feats} f LEFT JOIN {ratios_sql} r ON f.b = r.b
 GROUP BY f.id)"""


def dsir_select_sql(scores_sql: str, k: int, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`dsir_select` (same hash Gumbel, same float
    order, same rounding)."""
    u = (
        f"((('0x' || substring(md5(({id_col})::VARCHAR), 1, 15))::BIGINT"
        f" % {N_BUCKETS}) + 0.5) / {float(N_BUCKETS)!r}"
    )
    gkey = f"(dsir_micro / 1000000.0 + (-ln(-ln({u}))))"
    return f"""
(SELECT * FROM (
   SELECT s.*, round({gkey}, 6) AS gkey FROM {scores_sql} s
 ) ORDER BY gkey DESC, {id_col} LIMIT {k})"""
