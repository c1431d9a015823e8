"""End-to-end pipeline: fixtures in all three formats → parse → union →
dedup → enrich → links → year → LLM → sinks (reference lifecycle §3.1)."""

import os

import pytest
from pyspark.sql import functions as F

from scholarmind_spark.llm.client import MockLLMClient
from scholarmind_spark.llm.templates import PromptTemplate
from scholarmind_spark.pipeline import PipelineConfig, build_corpus, process, run_pipeline
from scholarmind_spark.schemas import METRICS_SCHEMA
from scholarmind_spark.sinks import flatten_for_presentation, write_parquet, write_sheets_csv

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

TEMPLATE = PromptTemplate(
    type="custom",
    name="t",
    system="sys",
    user_template="Abstract: {abstract}",
    fields=["summary", "method"],
    default_values={"summary": "-", "method": "-"},
)


@pytest.fixture(scope="module")
def cfg(spark):
    metrics = spark.createDataFrame(
        [("nature", "69.5", "Q1", "1")], schema=METRICS_SCHEMA
    )
    return PipelineConfig(
        sources={
            "pubmed": f"{FIX}/pubmed.txt",
            "wos": f"{FIX}/wos.txt",
            "sciencedirect": f"{FIX}/sciencedirect.txt",
        },
        metrics_df=metrics,
        llm_template=TEMPLATE,
        llm_client=MockLLMClient(fields=TEMPLATE.fields, mode="json"),
    )


@pytest.fixture(scope="module")
def result(spark, cfg):
    df = run_pipeline(spark, cfg)
    df.cache().count()
    return df


def test_pipeline_composes_all_stages(result):
    cols = set(result.columns)
    # dedup artifacts
    assert "doi_norm" not in cols  # helper dropped like reference main.py:156
    # links (D6/D7/A2), year (D2), metrics (J1), LLM fields (U1)
    for c in ["title_link", "doi_link", "publication_year", "impact_factor",
              "summary", "method"]:
        assert c in cols, c


def test_pipeline_dedups_across_sources(spark, cfg, result):
    raw = build_corpus(spark, cfg.sources)
    # fixtures share DOIs across sources: union > deduped survivor count
    assert raw.count() > result.count()
    # every surviving duplicate-DOI row is the highest-priority source
    from scholarmind_spark.functions.doi import doi_norm

    shared = (
        raw.select(doi_norm(F.col("doi")).alias("dn"), "source_type")
        .filter(F.col("dn") != "")
        .groupBy("dn")
        .agg(F.count("*").alias("n"), F.max("source_type").alias("_"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert shared > 0  # the scenario actually exercises A1


def test_llm_fields_keyed_not_positional(result):
    # non-null abstracts got mock output derived from THEIR text, keyed join
    rows = result.filter(F.col("abstract").isNotNull()).select("abstract", "summary").collect()
    assert rows and all(r["summary"] not in (None, "") for r in rows)


def test_parquet_sink_partitions(tmp_path, result):
    out = str(tmp_path / "corpus")
    write_parquet(result, out)
    parts = {d for d in os.listdir(out) if d.startswith("source_type=")}
    assert len(parts) >= 2  # one dir per source present


def test_csv_sheet_sink_layout(tmp_path, result):
    paths = write_sheets_csv(result, str(tmp_path / "sheets"))
    assert set(paths) == {"Results", "WOS", "PubMed", "ScienceDirect"}
    import csv

    with open(paths["Results"]) as f:
        header = next(csv.reader(f))
    assert "title_link" in header and "doi_link" in header


def test_flatten_policy(result):
    flat = flatten_for_presentation(result)
    types = dict(flat.dtypes)
    assert not any(t.startswith("array") for t in types.values())
    # nulls render '' on string columns (reference D10)
    row = flat.limit(1).collect()[0]
    assert all(v is not None for k, v in row.asDict().items() if isinstance(v, str) or v == "")


def test_progress_monotone_two_stage(spark):
    """Engine-side progress: a run with a driver-side metrics fetch
    (journal_metrics band) followed by a tracked sink action (sink band)
    emits monotone non-decreasing percents that visit both bands."""
    from scholarmind_spark.progress import watch_action

    events = []
    cfg2 = PipelineConfig(
        sources={"pubmed": f"{FIX}/pubmed.txt"},
        metrics_fetch_one=lambda j: {"impact_factor": "1.0"},
        llm_template=None,
        llm_client=None,
    )
    # shrink the fetch throttle so the test doesn't sleep 0.5s per journal
    import scholarmind_spark.operators.enrich as enrich_mod

    orig = enrich_mod.fetch_metrics_df

    def fast_fetch(spark_, journals, fetch_one, min_interval_s=0.5, **kw):
        return orig(spark_, journals, fetch_one, min_interval_s=0.0, **kw)

    enrich_mod.fetch_metrics_df = fast_fetch
    try:
        df = run_pipeline(spark, cfg2, progress_callback=events.append)
    finally:
        enrich_mod.fetch_metrics_df = orig

    from scholarmind_spark.progress import ProgressReporter

    reporter = ProgressReporter(events.append)
    reporter._high_water = events[-1].percent if events else 0.0
    watch_action(spark, reporter, "sink", lambda: df.count(), poll_s=0.05)

    assert len(events) >= 3
    pcts = [e.percent for e in events]
    assert pcts == sorted(pcts), pcts  # monotone non-decreasing
    stages = {e.stage for e in events}
    assert "journal_metrics" in stages
    assert "sink" in stages
    assert pcts[-1] == 100.0


def test_corpus_record_ids_unique(spark, cfg):
    # record_id is a probabilistic 64-bit content-hash key (pipeline.py
    # build_corpus docstring): a collision silently MERGES two records in
    # every downstream keyed join (LLM attach dropDuplicates, dedup
    # tiebreak).  This assertion turns a collision — or an upstream
    # id-generation regression — into a loud failure instead.
    corpus = build_corpus(spark, cfg.sources)
    stats = corpus.agg(
        F.count("*").alias("n"),
        F.countDistinct("record_id").alias("n_ids"),
    ).collect()[0]
    assert stats.n == stats.n_ids, (
        f"record_id collision: {stats.n} records, {stats.n_ids} distinct ids"
    )


def test_assert_unique_record_ids_pass_and_fail(spark, cfg):
    from scholarmind_spark.pipeline import assert_unique_record_ids

    corpus = build_corpus(spark, cfg.sources)
    assert_unique_record_ids(corpus)  # real corpus: no collisions

    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "record_id long, title string"
    )
    with pytest.raises(AssertionError, match="duplicate record_id"):
        assert_unique_record_ids(dup)
