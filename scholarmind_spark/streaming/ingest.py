"""Watched-directory literature ingest (reference S6, the web upload
source ``app.py:42`` + ``main.py`` file-path args, re-expressed as the
Spark-native equivalent: a Structured Streaming file source).

Files dropped into the directory are picked up per microbatch, parsed with
the SAME record parsers the batch scans use (Spark's unified batch/stream
DataFrame semantics — the parse stage is literally shared code), and emit
the fixed RECORD_SCHEMA.  Downstream, the corpus pipeline stages
(dedup/enrich/links) apply unchanged on the stream or on each drained
microbatch.

``record_id`` divergence from the batch scans (documented): streaming
cannot use ``monotonically_increasing_id`` (non-deterministic across
retried microbatches), so the id is a 60-bit content hash of
(title, abstract) — stable under replays, collision-negligible at any
corpus size.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scholarmind_spark.schemas import RECORD_COLUMNS
from scholarmind_spark.sources.base import stable_record_id
from scholarmind_spark.sources.base import _PARSE_SCHEMA, records_to_pdf


def _parse_stream(
    raw: DataFrame, parse_file: Callable[[str], list[dict[str, Any]]], source_type: str
) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records: list[dict[str, Any]] = []
            for chunk in pdf["value"]:
                records.extend(parse_file(chunk))
            yield records_to_pdf(records)

    parsed = raw.mapInPandas(run, schema=_PARSE_SCHEMA)
    parsed = (
        parsed.withColumn("source_type", F.lit(source_type))
        .filter(F.col("abstract").isNotNull())
        .withColumn(
            # FULL-record content hash (sources/base.stable_record_id):
            # the previous title+abstract-only md5 collided for distinct
            # records sharing both (same paper re-exported, versions
            # differing only in doi/authors/journal), and a colliding key
            # fans out the LLM attach join — the bug class the keyed
            # attach exists to kill.  Byte-identical records still share
            # an id by design (the batch path's documented semantics; the
            # LLM map dedups keys, priority-dedup collapses them).
            "record_id",
            stable_record_id(),
        )
    )
    return parsed.select(*RECORD_COLUMNS)


def stream_scan_pubmed(spark: SparkSession, watch_dir: str) -> DataFrame:
    """Streaming PubMed tagged-text scan over a watched directory: record-
    delimiter read (``lineSep='\\n\\n'``) so records split within files."""
    from scholarmind_spark.sources.pubmed import parse_pubmed_file

    raw = spark.readStream.option("lineSep", "\n\n").text(watch_dir)
    return _parse_stream(raw, parse_pubmed_file, "pubmed")


def stream_scan_wos(spark: SparkSession, watch_dir: str) -> DataFrame:
    """Streaming WOS tagged-text scan: WOS records end with ``ER`` lines,
    so plain per-file reads split on blank-line boundaries too."""
    from scholarmind_spark.sources.wos import parse_wos_file

    raw = spark.readStream.option("lineSep", "\n\n").text(watch_dir)
    return _parse_stream(raw, parse_wos_file, "wos")
