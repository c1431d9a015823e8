"""Trained quality-classifier scoring — the CCNet / LLaMA-pipeline
"quality filter" stage (Wenzek et al. 2020 train a fastText classifier;
Touvron et al. 2023 filter CommonCrawl with a Wikipedia-reference
classifier).  This module trains a multinomial Naive-Bayes text
classifier IN ONE AGGREGATION PASS (closed form — no gradient loop, no
driver iteration) and scores every document with its total log-odds.

Why Naive-Bayes and not logistic/fastText: NB's maximum-likelihood
estimate is a pair of token histograms, which Spark computes in ONE
groupBy — the training is as distributed and as deterministic as the
scoring, and the learned per-token log-odds table is exactly the linear
model a fastText-style filter applies (unigram features, additive
scores).  Swapping in externally-trained weights is a one-join change:
:func:`nb_quality_score_weights` scores any ``(token, weight_micro)``
relation (+ prior/OOV constants) with no training pass, and
:func:`nb_export_weights` emits the self-trained model in that portable
form — export→score parity is bit-exact (``test_external_weights_parity``).

Labels default to the engine's own Gopher RULE battery
(:func:`operators.quality.gopher_quality_flags` — the projection-only,
zero-shuffle half of the Gopher keep decision) as the weak supervision
source — the standard bootstrap when no hand-labeled quality set
exists, and deliberately the cheap half: the labeler runs once per
training pass, and the repetition battery's count shuffle would
dominate the whole pipeline while barely moving the label set.  Pass
``labels`` to train on the full battery
(:func:`operators.quality.gopher_keep`) or any curated table instead.

Scale shape (everything linear, nothing all-pairs):

- training: one token explode + ONE groupBy (the token-class histogram)
  — map-side partial aggregation makes the shuffle vocab-sized, not
  corpus-sized; class totals and vocabulary size fold out of the
  vocab-sized histogram, so the corpus is never re-scanned for them;
- scoring: tokens ⋈ model on the token string (AQE broadcasts the model
  when the vocabulary fits, shuffle-joins otherwise), then one
  per-document sum — a second vocab/corpus-keyed shuffle;
- the class priors and vocabulary size are ONE-ROW aggregates attached
  via broadcast crossJoin (the ``text_lm_score`` device).

Engine-exact arithmetic: every log term is rounded to integer micro-nats
BEFORE the per-document sum (the ``operators/lm.py`` discipline), so the
Spark and DuckDB twins agree bit-for-bit.

Reference parity note: the upstream reference (ScholarMind) has no model
training of any kind — this extends the engine for LLM-training-data
curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.textstats import tokens, tokens_sql
from scholarmind_spark.util import attach_caches


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    words = F.transform(tokens(F.col(text_col)), F.lower)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(words).alias("w"))
        .filter(F.col("w") != "")
    )


def nb_quality_score(
    df: DataFrame,
    labels: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``id_col, n_tokens, nbq_micro, pred_keep`` — total Naive-Bayes
    log-odds (keep vs drop) per document in integer micro-nats, add-one
    smoothed, class prior included; ``pred_keep = nbq_micro > 0``.

    ``labels`` is ``(id_col, keep boolean)``; default: the Gopher rule
    battery over ``df`` itself (weak supervision).  Documents whose label
    row is missing are scored but excluded from training.  Documents with
    ZERO tokens are omitted (no likelihood is defined for them — the
    ``bigram_lm_score`` contract, one level down).  An EMPTY label
    relation still yields defined scores: the class sums coalesce to 0
    and V clamps to ≥1, so every term collapses to ``ln(1) - ln(V) -
    ln(1) + ln(V) = 0`` and the prior to ``ln(1/1) = 0`` — score 0,
    ``pred_keep`` false — rather than NULL-poisoning the whole column.
    """
    if labels is None:
        from scholarmind_spark.operators.quality import gopher_quality_flags

        labels = gopher_quality_flags(df, id_col, text_col).select(id_col, "keep")
    # the weak-label battery (two corpus scans when Gopher-derived) feeds
    # both the model and the prior — persist so it runs once, not three
    # times (model, totals, prior all sit above it in the plan)
    lab = labels.select(F.col(id_col).alias("id"), F.col("keep").alias("y")).persist()

    toks = _doc_tokens(df, id_col, text_col).persist()
    train = toks.join(lab, "id")  # inner: unlabeled docs don't train

    # token-class histograms: c1 = occurrences in keep docs, c0 in drop —
    # the ONLY pass over the train relation; totals/vocab derive from it
    model = train.groupBy("w").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("c0"),
    ).persist()
    # class token totals + vocabulary size from the vocab-sized histogram
    # (n1 = Σc1, n0 = Σc0, V = rows); document-count priors from labels —
    # all one-row aggregates (broadcast attaches)
    # sums coalesce to 0 so an empty/one-class label relation degrades to
    # defined scores instead of a NULL aggregate poisoning every row
    # V clamps to ≥1 (uniform smoothing over a 1-token vocabulary when
    # nothing trained) so no ln(0) reaches a term
    totals = model.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).alias("n1"),
        F.coalesce(F.sum("c0"), F.lit(0)).alias("n0"),
        F.greatest(F.count("*"), F.lit(1)).alias("V"),
    )
    prior = lab.agg(
        F.round(
            (
                F.log(F.coalesce(F.sum(F.when(F.col("y"), 1).otherwise(0)), F.lit(0)) + 1)
                - F.log(F.coalesce(F.sum(F.when(F.col("y"), 0).otherwise(1)), F.lit(0)) + 1)
            )
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("prior_micro")
    )

    term_micro = F.round(
        (
            F.log(F.coalesce(F.col("c1"), F.lit(0)) + 1)
            - F.log(F.col("n1") + F.col("V"))
            - F.log(F.coalesce(F.col("c0"), F.lit(0)) + 1)
            + F.log(F.col("n0") + F.col("V"))
        )
        * F.lit(1000000.0)
    ).cast("bigint")
    scored = (
        toks.join(model, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select("id", term_micro.alias("__t"))
        .groupBy("id")
        .agg(F.count("*").alias("n_tokens"), F.sum("__t").alias("__s"))
    )
    out = scored.crossJoin(F.broadcast(prior)).select(
        F.col("id").alias(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("__s") + F.col("prior_micro")).alias("nbq_micro"),
        ((F.col("__s") + F.col("prior_micro")) > 0).alias("pred_keep"),
    )
    return attach_caches(out, [toks, lab, model])


def nb_quality_score_sql(
    table: str,
    labels_sql: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`nb_quality_score`.  ``labels_sql`` must
    select ``(id_col, keep)``; default mirrors the Gopher rule-battery
    weak labels via :func:`operators.quality.gopher_quality_flags_sql`.
    Every aggregate cast ``::BIGINT`` (DuckDB sum → HUGEINT)."""
    if labels_sql is None:
        from scholarmind_spark.operators.quality import gopher_quality_flags_sql

        labels_sql = (
            f"SELECT {id_col}, keep"
            f" FROM ({gopher_quality_flags_sql(table, id_col, text_col)})"
        )
    toks = f"list_transform({tokens_sql(text_col)}, w -> lower(w))"
    return f"""
WITH __lab AS MATERIALIZED (SELECT {id_col} AS id, keep AS y FROM ({labels_sql})),
-- __lab materialized: window-bearing labels_sql (e.g. the full Gopher
-- battery) otherwise gets inlined under the LATERAL DuckDB plans for
-- the materialized __tok and the binder rejects it ("LATERAL join
-- cannot contain window functions"); it also evaluates the labeler once
__tok AS MATERIALIZED (
  SELECT id, w FROM (
    SELECT {id_col} AS id, unnest({toks}) AS w FROM {table}
  ) WHERE w <> ''
),
__train AS (SELECT t.id, t.w, l.y FROM __tok t JOIN __lab l ON t.id = l.id),
__model AS (
  SELECT w,
         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS c0
  FROM __train GROUP BY w
),
__tot AS (
  SELECT coalesce(sum(c1), 0)::BIGINT AS n1, coalesce(sum(c0), 0)::BIGINT AS n0,
         greatest(count(*), 1)::BIGINT AS V
  FROM __model
),
__prior AS (
  SELECT round((ln(coalesce(sum(CASE WHEN y THEN 1 ELSE 0 END), 0) + 1)
              - ln(coalesce(sum(CASE WHEN y THEN 0 ELSE 1 END), 0) + 1))
              * 1000000.0)::BIGINT
         AS prior_micro
  FROM __lab
),
__scored AS (
  SELECT t.id,
         count(*)::BIGINT AS n_tokens,
         sum(round((ln(coalesce(m.c1, 0) + 1) - ln(o.n1 + o.V)
                   - ln(coalesce(m.c0, 0) + 1) + ln(o.n0 + o.V))
                  * 1000000.0)::BIGINT)::BIGINT AS s_micro
  FROM __tok t
  LEFT JOIN __model m ON t.w = m.w
  CROSS JOIN __tot o
  GROUP BY t.id
)
SELECT s.id AS {id_col}, s.n_tokens,
       (s.s_micro + p.prior_micro)::BIGINT AS nbq_micro,
       (s.s_micro + p.prior_micro) > 0 AS pred_keep
FROM __scored s CROSS JOIN __prior p
"""


def nb_export_weights(
    df: DataFrame,
    labels: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, int, int]:
    """Export the trained model as the portable linear form:
    ``((token, weight_micro) DataFrame, prior_micro, oov_micro)`` —
    per-token integer micro-nat log-odds, the document-count prior, and
    the weight an out-of-vocabulary token scores (the smoothing
    constant ``ln(1) − ln(n1+V) − ln(1) + ln(n0+V)``, same float order
    as the in-line scorer's coalesce-to-0 path).

    This is the docstring's "swapping in externally-trained weights is a
    one-join change" claim made load-bearing: feeding the export into
    :func:`nb_quality_score_weights` reproduces :func:`nb_quality_score`
    bit-for-bit (pinned by ``test_external_weights_parity``), and any
    fastText/logistic model distilled to per-token micro-nat weights
    scores through the identical join + sum.

    ``prior_micro``/``oov_micro`` are driver-side ints (one-row
    aggregates — the external-model use case hands them over in a
    config anyway); the weight relation stays distributed.
    """
    if labels is None:
        from scholarmind_spark.operators.quality import gopher_quality_flags

        labels = gopher_quality_flags(df, id_col, text_col).select(id_col, "keep")
    # same persist discipline as nb_quality_score: the weak-label battery
    # and the token histogram each feed MULTIPLE driver actions here (the
    # oov/prior first()s below, plus whatever action the caller runs on
    # the returned weights) — persist so they compute once, not per action
    lab = labels.select(
        F.col(id_col).alias("id"), F.col("keep").alias("y")
    ).persist()
    toks = _doc_tokens(df, id_col, text_col)
    train = toks.join(lab, "id")
    model = train.groupBy("w").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("y"), 0).otherwise(1)).alias("c0"),
    ).persist()
    totals = model.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).alias("n1"),
        F.coalesce(F.sum("c0"), F.lit(0)).alias("n0"),
        F.greatest(F.count("*"), F.lit(1)).alias("V"),
    )

    def _term(c1, c0):
        return F.round(
            (
                F.log(c1 + 1)
                - F.log(F.col("n1") + F.col("V"))
                - F.log(c0 + 1)
                + F.log(F.col("n0") + F.col("V"))
            )
            * F.lit(1000000.0)
        ).cast("bigint")

    weights = model.crossJoin(F.broadcast(totals)).select(
        "w",
        _term(
            F.coalesce(F.col("c1"), F.lit(0)), F.coalesce(F.col("c0"), F.lit(0))
        ).alias("weight_micro"),
    )
    oov_micro = int(
        totals.select(
            _term(F.lit(0), F.lit(0)).alias("o")
        ).first()["o"]
    )
    prior_micro = int(
        lab.agg(
            F.round(
                (
                    F.log(
                        F.coalesce(
                            F.sum(F.when(F.col("y"), 1).otherwise(0)), F.lit(0)
                        )
                        + 1
                    )
                    - F.log(
                        F.coalesce(
                            F.sum(F.when(F.col("y"), 0).otherwise(1)), F.lit(0)
                        )
                        + 1
                    )
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("p")
        ).first()["p"]
    )
    # weights' plan reads the persisted model (already materialized by the
    # oov action); the caller releases via release_caches(weights)
    return attach_caches(weights, [lab, model]), prior_micro, oov_micro


def nb_quality_score_weights(
    df: DataFrame,
    weights: DataFrame,
    prior_micro: int = 0,
    oov_micro: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents with an EXTERNALLY-supplied linear model —
    ``weights`` is any ``(w string, weight_micro bigint)`` relation
    (a :func:`nb_export_weights` export, a distilled fastText model, a
    hand-curated keyword table); ``oov_micro`` scores tokens the model
    has never seen, ``prior_micro`` is the additive document prior.

    Same output contract and scale shape as :func:`nb_quality_score`'s
    scoring half: one token explode, one token-keyed join (AQE
    broadcasts a small model), one per-document sum — no training pass
    at all, which is the point: score 100 TB with a model trained
    elsewhere (or last week) without re-aggregating the corpus.
    """
    toks = _doc_tokens(df, id_col, text_col)
    w = weights.select(
        F.col("w"), F.col("weight_micro").cast("bigint").alias("__wm")
    )
    scored = (
        toks.join(w, "w", "left")
        .select("id", F.coalesce(F.col("__wm"), F.lit(int(oov_micro))).alias("__t"))
        .groupBy("id")
        .agg(F.count("*").alias("n_tokens"), F.sum("__t").alias("__s"))
    )
    return scored.select(
        F.col("id").alias(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("__s") + F.lit(int(prior_micro))).alias("nbq_micro"),
        ((F.col("__s") + F.lit(int(prior_micro))) > 0).alias("pred_keep"),
    )
