"""Plan-regression guards: the properties that make the battery scale must
survive refactors — no accidental cartesian products anywhere, pushed scan
filters and broadcast joins where the design depends on them."""

from __future__ import annotations

import pytest

from scholarmind_spark.queries import SPARK_QUERIES

SF = "/root/testdata/sf0.001"

# build-time side effects (streaming drains, table writes, driver loops) —
# plan inspection would execute them; their plans are covered by their own
# tests/gate entries
SKIP = {
    "events_tumbling_stream", "events_sliding_stream", "events_session_stream",
    "events_stream_dedup", "events_stream_interval_join", "events_stream_enrich",
    "events_stream_anomaly",
    "events_stateful_user_stats", "bucketed_join_revenue", "dedup_clusters",
    "dedup_cluster_sizes",
    "jsonl_roundtrip", "partitioned_prune_events", "orc_roundtrip",
    "diag_jsonl_len", "diag_jsonl_hash", "diag_orc_ints", "diag_orc_price",
}

# deliberate broadcast nested-loop joins: the all-pairs exact baselines, the
# K-way centroid-assignment cross-product (K tiny, broadcast side), and the
# one-row scalar attaches (mixture rate derivation, BM25 corpus stats)
BNLJ_OK = {
    "ann_cosine_topk", "ann_ivf_topk", "kmeans_assign_cells",
    "dataset_mixture", "text_bm25_topk", "text_lm_score",
    "embed_centroid_classify", "source_vocab_overlap", "fk_audit",
    "events_mutual_information", "skew_key_report", "text_collocations",
    "events_daily_drift",
    # fuzzy_link's tiny-key path: keys of length <= d cross keys of
    # length <= 2d — both sets are DISTINCT strings, so alphabet-bounded
    # regardless of corpus size (the main PassJoin path is an equi-join)
    "link_fuzzy_vocab",
}


def _plan(df) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_no_cartesian_products(spark):
    offenders = []
    for name, fn in SPARK_QUERIES.items():
        if name in SKIP:
            continue
        plan = _plan(fn(spark, SF))
        if "CartesianProduct" in plan:
            offenders.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders.append(f"{name} (BNLJ)")
    assert offenders == []


@pytest.mark.parametrize(
    "name,needle",
    [
        # filters reach the parquet scan
        ("q6_forecast_revenue", "PushedFilters: [IsNotNull(l_shipdate)"),
        # dimension joins broadcast
        ("q5_regional_revenue", "BroadcastHashJoin"),
        ("lit_enrich_join", "BroadcastHashJoin"),
        # near-dup pair listing verifies candidates via vectorized array
        # intersection over the cached per-doc hash arrays (the prefix
        # self-join's strategy is size-based: broadcast at this tiny SF,
        # shuffle at scale — SCALE.md carries the at-scale evidence)
        ("dedup_ngram_jaccard", "array_intersect"),
    ],
)
def test_plan_properties(spark, name, needle):
    assert needle in _plan(SPARK_QUERIES[name](spark, SF))
