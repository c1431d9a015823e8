"""Journal-metrics enrichment (reference J1, ``main.py:354-437``).

The reference builds a per-process dict of journal → metrics by fetching an
external API once per distinct journal (cache ``journal_metrics.py:11,37-39``,
≤2 req/s throttle ``:80-90``) and maps values back row-by-row.  Spark-first:
the lookup becomes a small DataFrame keyed by ``journal_norm`` and the
map-back becomes a **broadcast left join** — the metrics side is tiny
(distinct journals), so no shuffle touches the big side.  Unmatched journals
yield ``''`` for every metric column (``main.py:413-421``).

The fetch itself stays on the driver (distinct-collect → client calls with
the same throttle) behind an injectable client; tests use an offline
metrics DataFrame.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from scholarmind_spark.functions.text import journal_norm
from scholarmind_spark.schemas import METRICS_SCHEMA


def distinct_journals(df: DataFrame) -> list[str]:
    """Distinct non-null, non-empty normalized journal names
    (reference G1, main.py:368-371) — driver-side collect of a tiny set."""
    rows = (
        df.select(journal_norm(F.col("journal")).alias("journal_norm"))
        .filter(F.col("journal_norm").isNotNull() & (F.col("journal_norm") != ""))
        .distinct()
        .collect()
    )
    return sorted(r.journal_norm for r in rows)


def fetch_metrics_df(
    spark: SparkSession,
    journals: list[str],
    fetch_one: Callable[[str], dict[str, str] | None],
    min_interval_s: float = 0.5,
    metric_columns: list[str] | None = None,
    progress: Callable[[int, int], None] | None = None,
) -> DataFrame:
    """Throttled driver-side fetch (reference rate cap 2 req/s,
    journal_metrics.py:85-87); each distinct journal fetched exactly once
    (the distinct+join pattern subsumes the reference's request cache).

    ``metric_columns`` defaults to the fetcher's declared ``columns``
    (``metrics_client.make_fetch_one`` sets it from the configured column
    mapping), else the fixed METRICS_SCHEMA trio."""
    if metric_columns is None:
        metric_columns = getattr(
            fetch_one, "columns", [f.name for f in METRICS_SCHEMA.fields[1:]]
        )
    schema = StructType(
        [METRICS_SCHEMA.fields[0]]
        + [StructField(c, StringType(), True) for c in metric_columns]
    )
    rows = []
    last = 0.0
    for i, j in enumerate(journals):
        wait = min_interval_s - (time.monotonic() - last)
        if wait > 0:
            time.sleep(wait)
        last = time.monotonic()
        m = fetch_one(j) or {}
        rows.append(tuple([j] + [m.get(c, "") for c in metric_columns]))
        if progress is not None:
            # per-journal tick, mirroring the reference loop (main.py:393-406)
            progress(i + 1, len(journals))
    return spark.createDataFrame(rows, schema)


def enrich_with_metrics(df: DataFrame, metrics_df: DataFrame) -> DataFrame:
    """Broadcast left join on journal_norm + ``''``-fill (reference J1).

    Idempotent: metric columns already present on ``df`` (a corpus read
    back from a previously enriched parquet) are dropped first and
    re-derived from ``metrics_df`` — without the drop the join produced
    two same-named columns and the ''-fill raised AMBIGUOUS_REFERENCE."""
    metric_cols = [c for c in metrics_df.columns if c != "journal_norm"]
    stale = [c for c in metric_cols if c in df.columns]
    if stale:
        df = df.drop(*stale)
    out = (
        df.withColumn("journal_norm", journal_norm(F.col("journal")))
        .join(F.broadcast(metrics_df), on="journal_norm", how="left")
        .withColumns({c: F.coalesce(F.col(c), F.lit("")) for c in metric_cols})
        .drop("journal_norm")  # temp key dropped as in main.py:425-426
    )
    return out
