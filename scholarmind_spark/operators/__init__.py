from scholarmind_spark.operators.dedup import dedup_exact, priority_dedup, source_priority
from scholarmind_spark.operators.enrich import (
    distinct_journals,
    enrich_with_metrics,
    fetch_metrics_df,
)
from scholarmind_spark.operators.union import union_sources

__all__ = [
    "dedup_exact",
    "priority_dedup",
    "source_priority",
    "distinct_journals",
    "enrich_with_metrics",
    "fetch_metrics_df",
    "union_sources",
]
