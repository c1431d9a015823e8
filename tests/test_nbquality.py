"""Naive-Bayes quality classifier: one-pass training recovers the class
token signal, scoring separates the classes, and the model behaves under
explicit labels, missing labels, and degenerate class balance."""

from __future__ import annotations

import math

from scholarmind_spark.operators.nbquality import nb_quality_score
from scholarmind_spark.util import release_caches


def _score(spark, docs, labels=None):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    lab = (
        spark.createDataFrame(labels, "doc_id long, keep boolean")
        if labels is not None
        else None
    )
    out = nb_quality_score(df, labels=lab)
    rows = {r.doc_id: r for r in out.collect()}
    release_caches(out)
    return rows


GOOD = "the quick brown fox jumps over the lazy dog near the river bank today"
BAD = "buy buy buy cheap cheap pills pills pills click click click now now"


def test_separates_classes_on_explicit_labels(spark):
    docs = [(i, GOOD) for i in range(5)] + [(i + 5, BAD) for i in range(5)]
    labels = [(i, i < 5) for i in range(10)]
    got = _score(spark, docs, labels)
    assert len(got) == 10
    for i in range(5):
        assert got[i].pred_keep is True, got[i]
        assert got[i + 5].pred_keep is False, got[i + 5]
    # scores are symmetric in sign and ordered
    assert got[0].nbq_micro > 0 > got[5].nbq_micro


def test_unlabeled_docs_scored_but_not_trained(spark):
    docs = [(0, GOOD), (1, BAD), (2, GOOD + " extra")]
    labels = [(0, True), (1, False)]  # doc 2 unlabeled
    got = _score(spark, docs, labels)
    assert set(got) == {0, 1, 2}
    # doc 2 shares GOOD's tokens → classified keep despite not training
    assert got[2].pred_keep is True
    # the unseen token 'extra' falls back to the add-one smoothing term
    assert got[2].n_tokens == got[0].n_tokens + 1


def test_single_class_labels_degenerate_but_defined(spark):
    # all-keep labels: c0 = 0 everywhere — the add-one smoothing keeps
    # every log term finite, so scores are defined (their sign is NOT
    # guaranteed: ln(c1+1) - ln(n1+V) + ln(V) goes negative for rare
    # tokens once n1 > V, which is correct NB behavior, not a bug)
    docs = [(0, GOOD), (1, BAD)]
    labels = [(0, True), (1, True)]
    got = _score(spark, docs, labels)
    assert all(r.nbq_micro is not None for r in got.values())
    assert all(r.pred_keep is not None for r in got.values())


def test_default_gopher_rule_labels_run(spark):
    """Default weak labels (Gopher rule battery) wire up end-to-end on the
    real documents table and produce a verdict per doc with ≥2 tokens."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = nb_quality_score(df)
    rows = out.collect()
    release_caches(out)
    assert len(rows) > 0
    assert all(r.nbq_micro is not None for r in rows)


def test_micro_quantization_matches_closed_form(spark):
    """One tiny corpus cross-checked against a pure-Python NB with the
    same add-one smoothing and per-term micro-nat rounding."""
    docs = [(0, "a a b"), (1, "b c")]
    labels = [(0, True), (1, False)]
    got = _score(spark, docs, labels)

    toks = {0: ["a", "a", "b"], 1: ["b", "c"]}
    c1 = {"a": 2, "b": 1}
    c0 = {"b": 1, "c": 1}
    n1, n0 = 3, 2
    vocab = 3
    prior = round((math.log(2) - math.log(2)) * 1000000.0)  # = 0 here
    for did, ws in toks.items():
        s = 0
        for w in ws:
            s += round(
                (
                    math.log(c1.get(w, 0) + 1)
                    - math.log(n1 + vocab)
                    - math.log(c0.get(w, 0) + 1)
                    + math.log(n0 + vocab)
                )
                * 1000000.0
            )
        assert got[did].nbq_micro == s + prior, (did, got[did].nbq_micro, s)


def test_empty_label_relation_degrades_to_zero_scores(spark):
    # nothing trains: scores must be DEFINED (0 via the coalesce/clamp
    # guards), not NULL — the shape a mis-joined label feed produces
    docs = [(0, GOOD), (1, BAD)]
    got = _score(spark, docs, labels=[])
    assert len(got) == 2
    assert all(r.nbq_micro == 0 and r.pred_keep is False for r in got.values())


def test_external_weights_parity(spark):
    """The docstring's one-join-swap claim, load-bearing: scoring through
    nb_quality_score_weights with the model nb_export_weights exported
    reproduces the self-trained nb_quality_score bit-for-bit — including
    OOV tokens (doc 2 contains words the training labels never saw)."""
    from scholarmind_spark.operators.nbquality import (
        nb_export_weights,
        nb_quality_score_weights,
    )

    docs = [(0, GOOD), (1, BAD), (2, GOOD + " zebra quasar unseen")]
    labels = [(0, True), (1, False)]  # doc 2 scored, never trained
    df = spark.createDataFrame(docs, "doc_id long, text string")
    lab = spark.createDataFrame(labels, "doc_id long, keep boolean")

    inline = nb_quality_score(df, labels=lab)
    got_inline = {r.doc_id: r for r in inline.collect()}
    release_caches(inline)

    weights, prior_micro, oov_micro = nb_export_weights(df, labels=lab)
    # the export triggers multiple driver actions over the label battery
    # and the token histogram — the persist discipline (r13 ADVICE) tags
    # the returned weights with its caches, and they are live persists
    assert [c.storageLevel.useMemory for c in weights._sm_caches] == [True, True]
    got_ext = {
        r.doc_id: r
        for r in nb_quality_score_weights(
            df, weights, prior_micro=prior_micro, oov_micro=oov_micro
        ).collect()
    }
    release_caches(weights)
    assert set(got_ext) == set(got_inline) == {0, 1, 2}
    for did in got_inline:
        a, b = got_inline[did], got_ext[did]
        assert (a.n_tokens, a.nbq_micro, a.pred_keep) == (
            b.n_tokens,
            b.nbq_micro,
            b.pred_keep,
        ), did


def test_external_weights_shifted_model_diverges(spark):
    """A genuinely different external model produces different scores —
    per-token +1000 micro shifts every document by exactly
    n_tokens * 1000 (the additive linear form doing what it claims)."""
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.nbquality import (
        nb_export_weights,
        nb_quality_score_weights,
    )

    docs = [(0, GOOD), (1, BAD)]
    labels = [(0, True), (1, False)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    lab = spark.createDataFrame(labels, "doc_id long, keep boolean")
    weights, prior_micro, oov_micro = nb_export_weights(df, labels=lab)

    base = {
        r.doc_id: r
        for r in nb_quality_score_weights(
            df, weights, prior_micro, oov_micro
        ).collect()
    }
    shifted_w = weights.select(
        "w", (F.col("weight_micro") + 1000).alias("weight_micro")
    )
    shifted = {
        r.doc_id: r
        for r in nb_quality_score_weights(
            df, shifted_w, prior_micro, oov_micro + 1000
        ).collect()
    }
    for did in base:
        assert (
            shifted[did].nbq_micro - base[did].nbq_micro
            == base[did].n_tokens * 1000
        )
