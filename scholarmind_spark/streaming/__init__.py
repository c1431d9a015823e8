from scholarmind_spark.streaming.ingest import stream_scan_pubmed, stream_scan_wos
from scholarmind_spark.streaming.pipeline import (
    read_events_stream,
    run_to_memory,
    session_agg,
    ohlc_bars_agg,
    sliding_agg,
    stream_dedup,
    stream_interval_join,
    stream_static_enrich,
    manifest_state_dir,
    stream_fold_sketch_state,
    stream_merge_to_snapshot,
    tumbling_agg,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "session_agg",
    "ohlc_bars_agg",
    "sliding_agg",
    "stream_dedup",
    "stream_interval_join",
    "stream_static_enrich",
    "manifest_state_dir",
    "stream_fold_sketch_state",
    "stream_merge_to_snapshot",
    "stream_scan_pubmed",
    "stream_scan_wos",
    "tumbling_agg",
]
