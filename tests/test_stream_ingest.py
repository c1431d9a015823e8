"""Watched-directory streaming ingest (S6): stream parse == batch parse."""

import os
import shutil

from scholarmind_spark.streaming.ingest import stream_scan_pubmed, stream_scan_wos
from scholarmind_spark.streaming.pipeline import run_to_memory

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

CMP = ["title", "abstract", "journal", "doi", "source_type"]


def _drain(stream_df):
    return run_to_memory(stream_df, mode="append")


def test_stream_pubmed_matches_batch(spark, tmp_path):
    from scholarmind_spark.sources.pubmed import scan_pubmed

    watch = tmp_path / "incoming"
    watch.mkdir()
    shutil.copy(f"{FIX}/pubmed.txt", watch / "a.txt")

    got = _drain(stream_scan_pubmed(spark, str(watch)))
    want = scan_pubmed(spark, str(watch))
    grows = sorted(tuple(r[c] for c in CMP) for r in got.select(CMP).collect())
    wrows = sorted(tuple(r[c] for c in CMP) for r in want.select(CMP).collect())
    assert grows == wrows and len(grows) > 0
    # content-hash record ids: non-null, distinct across distinct records
    ids = [r.record_id for r in got.select("record_id").collect()]
    assert all(i is not None for i in ids) and len(set(ids)) == len(ids)


def test_stream_wos_matches_batch(spark, tmp_path):
    from scholarmind_spark.sources.wos import scan_wos

    watch = tmp_path / "incoming"
    watch.mkdir()
    shutil.copy(f"{FIX}/wos.txt", watch / "a.txt")

    got = _drain(stream_scan_wos(spark, str(watch)))
    want = scan_wos(spark, str(watch))
    grows = sorted(tuple(r[c] for c in CMP) for r in got.select(CMP).collect())
    wrows = sorted(tuple(r[c] for c in CMP) for r in want.select(CMP).collect())
    assert grows == wrows and len(grows) > 0


def test_stream_picks_up_new_files(spark, tmp_path):
    """Second drain of the same checkpointed stream processes only new
    files (the memory sink cannot recover a checkpoint, so this uses the
    parquet sink — the production shape anyway)."""
    watch = tmp_path / "incoming"
    watch.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    shutil.copy(f"{FIX}/pubmed.txt", watch / "a.txt")

    def drain_once():
        q = (
            stream_scan_pubmed(spark, str(watch))
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    n1 = drain_once()
    shutil.copy(f"{FIX}/pubmed.txt", watch / "b.txt")
    n2 = drain_once()
    assert n1 > 0 and n2 == 2 * n1  # only the new file's records were appended
