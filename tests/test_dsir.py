"""DSIR importance resampling: target-like documents score higher, the
Gumbel resample is deterministic under repartitioning, and the micro-nat
score matches the closed form on a tiny corpus."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from scholarmind_spark.operators.dsir import (
    dsir_bucket_logratio,
    dsir_score,
    dsir_select,
)

TARGETY = "the quiet library holds ancient books about science and history"
JUNKY = "click here buy now cheap deal click here buy now win prize"


def _corpus(spark, n_each=30):
    rows = [(i, f"{TARGETY} variant {i}") for i in range(n_each)] + [
        (1000 + i, f"{JUNKY} variant {i}") for i in range(n_each)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_targety_docs_outscore_junk(spark):
    df = _corpus(spark)
    target = df.filter(F.col("doc_id") < 1000)  # the target IS the style
    ratios = dsir_bucket_logratio(df, target)
    scores = {r.doc_id: r.dsir_micro for r in dsir_score(df, ratios).collect()}
    worst_targety = min(v for k, v in scores.items() if k < 1000)
    best_junky = max(v for k, v in scores.items() if k >= 1000)
    assert worst_targety > best_junky


def test_select_enriches_target_share(spark):
    df = _corpus(spark)
    target = df.filter(F.col("doc_id") < 1000)
    ratios = dsir_bucket_logratio(df, target)
    sel = dsir_select(dsir_score(df, ratios), 20)
    picked = [r.doc_id for r in sel.collect()]
    assert len(picked) == 20
    # corpus is 50/50; importance weights push the sample hard toward
    # the target style (junk only enters via extreme Gumbel draws)
    assert sum(1 for i in picked if i < 1000) >= 15


def test_deterministic_under_repartition(spark):
    df = _corpus(spark)
    target = df.filter(F.col("doc_id") < 1000)
    a = dsir_select(dsir_score(df, dsir_bucket_logratio(df, target)), 10)
    df2 = df.repartition(13)
    b = dsir_select(dsir_score(df2, dsir_bucket_logratio(df2, target)), 10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_score_matches_closed_form(spark):
    """One-doc corpora make the histograms enumerable: doc A 'x y'
    (features x, y, 'x y'), target doc 'x' (feature x).  Every term is
    computed by hand with the same smoothing and micro rounding."""
    from scholarmind_spark.operators.dsir import DSIR_BUCKETS as M

    raw = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    target = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    ratios = dsir_bucket_logratio(raw, target)
    got = dsir_score(raw, ratios).collect()[0]
    # target hist: {h(x): 1}, T=1; raw hist: {h(x):1, h(y):1, h('x y'):1}, R=3
    def term(ct, cr):
        return round(
            (
                math.log(ct + 1)
                - math.log(1 + M)
                - math.log(cr + 1)
                + math.log(3 + M)
            )
            * 1000000.0
        )

    expected = term(1, 1) + term(0, 1) + term(0, 1)  # x, y, 'x y'
    assert got.n_feats == 3
    assert got.dsir_micro == expected
