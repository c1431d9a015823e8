"""WET source/sink tests: byte-exact roundtrip (multi-byte UTF-8, blank
lines in payloads, empty payloads), delimiter-collision quarantine, and
non-conversion record skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from scholarmind_spark.sources.wet import read_wet, write_wet


def _roundtrip(spark, tmp_path, rows):
    path = str(tmp_path / "wet")
    df = spark.createDataFrame(rows, ["uri", "text"])
    write_wet(df, path)
    back = read_wet(spark, path)
    return {r["uri"]: r["text"] for r in back.collect()}


def test_roundtrip_multibyte_and_blank_lines(spark, tmp_path):
    rows = [
        ("https://a.example/1", "plain ascii text"),
        ("https://a.example/2", "café 中文 \U0001f600"),
        # a payload CONTAINING the header/body separator: the reader must
        # slice by Content-Length octets, not by the next blank line
        ("https://a.example/3", "para one\r\n\r\npara two"),
        ("https://a.example/4", ""),
    ]
    got = _roundtrip(spark, tmp_path, rows)
    assert got == dict(rows)


def test_content_length_is_octets_not_chars(spark, tmp_path):
    # 3 chars, 7 UTF-8 bytes: a char-based slice would over-read into the
    # record separator
    rows = [("https://a.example/u", "é中\U0001f600")]
    got = _roundtrip(spark, tmp_path, rows)
    assert got == dict(rows)


def test_payload_delimiter_collision_is_quarantined(spark, tmp_path):
    # a payload containing the WARC/1.0 record magic splits the record:
    # the head fragment fails its Content-Length check, the tail fragment
    # is headless — BOTH must surface as corrupt, and the default read
    # must drop them without touching the good record
    rows = [
        ("https://a.example/bad", "evil\r\nWARC/1.0\r\npayload"),
        ("https://a.example/good", "fine"),
    ]
    path = str(tmp_path / "wet")
    df = spark.createDataFrame(rows, ["uri", "text"])
    write_wet(df, path)

    clean = read_wet(spark, path)
    assert {r["uri"] for r in clean.collect()} == {"https://a.example/good"}

    all_rows = read_wet(spark, path, keep_corrupt=True)
    n_corrupt = all_rows.filter(F.col("_corrupt")).count()
    assert n_corrupt == 2  # truncated head + headless tail


def test_non_conversion_records_are_skipped(spark, tmp_path):
    # hand-write a file with a warcinfo record ahead of a conversion one
    # (crawler-produced layout)
    payload = "hello wet"
    raw = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "Content-Length: 9\r\n"
        "\r\n"
        "info body\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://a.example/x\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
        f"{payload}\r\n"
        "\r\n"
    )
    path = tmp_path / "crawl.wet"
    path.write_bytes(raw.encode())
    back = read_wet(spark, str(path)).collect()
    assert len(back) == 1
    assert back[0]["uri"] == "https://a.example/x"
    assert back[0]["text"] == payload
    assert back[0]["warc_date"] == "2024-01-01T00:00:00Z"


def test_every_part_file_is_self_delimiting(spark, tmp_path):
    # multi-partition write: each part file must start with the record
    # magic so any subset of shards parses standalone
    import os

    path = str(tmp_path / "wet")
    rows = [(f"https://a.example/{i}", f"doc {i}") for i in range(20)]
    write_wet(spark.createDataFrame(rows, ["uri", "text"]).repartition(4), path)
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(parts) >= 2
    for p in parts:
        with open(os.path.join(path, p), "rb") as fh:
            head = fh.read(9)
        if head:  # empty partitions produce empty files — also valid
            assert head == b"WARC/1.0\r"
    assert len(read_wet(spark, path).collect()) == 20


def test_writer_percent_encodes_header_injection(spark, tmp_path):
    # a URI carrying CR/LF must not forge header lines (e.g. a second
    # Content-Length) — the writer percent-encodes the control chars and
    # the record round-trips intact
    evil = "https://a.example/x\r\nContent-Length: 999999"
    rows = [(evil, "payload"), ("https://a.example/ok", "fine")]
    path = str(tmp_path / "wet")
    write_wet(spark.createDataFrame(rows, ["uri", "text"]), path)
    back = {r["uri"]: r["text"] for r in read_wet(spark, path).collect()}
    assert back == {
        "https://a.example/x%0D%0AContent-Length: 999999": "payload",
        "https://a.example/ok": "fine",
    }


def test_streaming_wet_equals_batch(spark, tmp_path):
    # stream == batch by construction (one parse code path): drain the
    # watched-dir stream with availableNow and compare to the batch read
    from scholarmind_spark.sources.wet import read_wet_stream
    from scholarmind_spark.streaming.pipeline import run_to_memory

    path = str(tmp_path / "wet")
    rows = [(f"https://a.example/{i}", f"doc {i} body text") for i in range(30)]
    write_wet(spark.createDataFrame(rows, ["uri", "text"]).repartition(3), path)

    batch = sorted(tuple(r) for r in read_wet(spark, path).collect())
    drained = run_to_memory(read_wet_stream(spark, path), mode="append")
    stream = sorted(tuple(r) for r in drained.collect())
    assert stream == batch
    assert len(stream) == 30
