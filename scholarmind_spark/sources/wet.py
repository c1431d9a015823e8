"""WET (WARC text-extraction) source/sink — the Common Crawl corpus format.

Engine extension (SURVEY §2 — the reference ingests bibliographic
exports, not web crawls): WET is the de-facto wire format of the large
text corpora a 100 TB training-data pipeline actually starts from
(Common Crawl publishes each crawl as ~90k ``*.warc.wet.gz`` shards;
C4, RefinedWeb and the CCNet pipeline all begin by parsing it).  A WET
file is a sequence of records::

    WARC/1.0\\r\\n
    WARC-Type: conversion\\r\\n
    WARC-Target-URI: https://example.org/page\\r\\n
    WARC-Date: 2024-01-01T00:00:00Z\\r\\n
    Content-Length: 1234\\r\\n
    \\r\\n
    <payload text>\\r\\n
    \\r\\n

Spark-first shape:

- ``read_wet`` frames records with the TEXT source's custom record
  delimiter (``lineSep='WARC/1.0\\r\\n'``).  Hadoop's LineRecordReader
  handles multi-byte delimiters spanning split boundaries, so ONE
  uncompressed multi-GB shard still parallelizes by block; gzip shards
  fall back to a task per file, which is fine at crawl scale — the
  parallelism unit is the ~90k-file shard set, not the bytes inside one
  file.  All field extraction is built-in regexp/substring Column
  expressions — JVM-side, codegen, zero Python.
- The payload is sliced by the record's ``Content-Length`` header in
  BYTES (octets, per the WARC spec): the raw tail is cast to binary,
  ``substring``-ed to exactly ``Content-Length`` octets, and cast back
  — multi-byte UTF-8 payloads round-trip exactly, and writer-appended
  record separators never leak into the text.
- Malformed records are quarantined, not dropped (the ``read_jsonl``
  discipline): a record whose payload happens to contain the delimiter
  sequence splits in two — the headless tail parses with an empty
  ``warc_type`` and a truncated head fails the Content-Length check;
  both surface as ``_corrupt = true`` so a quality gate can count them.
- ``write_wet`` serializes one full record per row through the text
  sink.  Records are self-delimiting (each row STARTS with the
  ``WARC/1.0`` magic), so partition boundaries and file ordering don't
  matter — every part file is a valid WET shard.  No leading
  ``warcinfo`` record is emitted: rows are unordered across partitions,
  so a positional header record cannot be guaranteed first (noted
  divergence from crawler-produced files; readers — including this one
  — skip non-``conversion`` records anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WET_DELIM = "WARC/1.0\r\n"


def write_wet(
    df: DataFrame,
    path: str,
    uri_col: str = "uri",
    text_col: str = "text",
    date: str = "2024-01-01T00:00:00Z",
) -> None:
    """Serialize ``df(uri, text)`` as WET records into text part files.
    ``Content-Length`` is the payload's octet length (WARC spec), so a
    byte-exact reader can recover the payload regardless of trailing
    separators.

    CR/LF in the URI are percent-encoded before serialization (RFC 3986
    forbids raw control chars in URIs anyway): a verbatim embed would
    let one row FORGE header lines — ``uri = 'https://x/a\\r\\n``
    ``Content-Length: 999999'`` injects a second Content-Length whose
    value the reader's regex would match first, over-reading the slice
    and desynchronizing the shard."""
    safe_uri = F.regexp_replace(
        F.regexp_replace(F.col(uri_col), "\r", "%0D"), "\n", "%0A"
    )
    rec = F.concat(
        F.lit(WET_DELIM),
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Target-URI: "), safe_uri, F.lit("\r\n"),
        F.lit(f"WARC-Date: {date}\r\n"),
        F.lit("Content-Type: text/plain\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(F.col(text_col)).cast("string"), F.lit("\r\n"),
        F.lit("\r\n"),
        F.col(text_col), F.lit("\r\n"),
    )
    df.select(rec.alias("value")).write.mode("overwrite").text(path)


def read_wet(
    spark: SparkSession, path: str, keep_corrupt: bool = False
) -> DataFrame:
    """``uri, warc_date, content_length, text`` for every ``conversion``
    record; with ``keep_corrupt`` the quarantine rows (empty/headless or
    Content-Length-truncated fragments) are kept with ``_corrupt=true``
    instead of filtered."""
    raw = spark.read.option("lineSep", WET_DELIM).text(path)
    return _parse_wet(raw, keep_corrupt)


def read_wet_stream(
    spark: SparkSession, path: str, keep_corrupt: bool = False
) -> DataFrame:
    """Streaming twin of :func:`read_wet` over a watched directory — the
    continuous-crawl ingest shape (new ``*.wet`` shards land, records
    flow downstream incrementally).  The record framing and parse are
    the SAME Column expressions as the batch reader (one code path, so
    stream == batch by construction — asserted by the availableNow
    drain test), and everything stays map-only: a WET parse adds no
    state, watermarks belong to whatever aggregation follows."""
    raw = (
        spark.readStream.option("lineSep", WET_DELIM)
        .text(path)
    )
    return _parse_wet(raw, keep_corrupt)


def _parse_wet(raw: DataFrame, keep_corrupt: bool) -> DataFrame:
    rec = raw.filter(F.trim(F.col("value")) != "")
    header = F.substring_index(F.col("value"), "\r\n\r\n", 1)
    # every field regex is LINE-ANCHORED ((?m)^): an unanchored
    # 'Content-Length:' would also match the same byte sequence occurring
    # mid-line in another header's VALUE (e.g. a URI containing the
    # percent-encoded remains of an injection attempt) and silently take
    # the wrong length
    parsed = rec.select(
        F.regexp_extract(header, r"(?m)^WARC-Type: ([^\r\n]+)", 1).alias(
            "warc_type"
        ),
        F.regexp_extract(
            header, r"(?m)^WARC-Target-URI: ([^\r\n]+)", 1
        ).alias("uri"),
        F.regexp_extract(header, r"(?m)^WARC-Date: ([^\r\n]+)", 1).alias(
            "warc_date"
        ),
        F.regexp_extract(header, r"(?m)^Content-Length: ([0-9]+)", 1)
        .cast("long")
        .alias("content_length"),
        # payload starts after header + the blank line (4 chars \r\n\r\n);
        # Column API with real control chars — no expr-string escaping
        F.col("value")
        .substr(F.length(header) + F.lit(5), F.lit(2_000_000_000))
        .alias("tail"),
    )
    sliced = parsed.withColumn(
        "text",
        F.col("tail")
        .cast("binary")
        .substr(F.lit(1), F.col("content_length"))
        .cast("string"),
    ).withColumn(
        "_corrupt",
        (F.col("warc_type") == "")
        | F.col("content_length").isNull()
        | (F.octet_length("tail") < F.col("content_length")),
    )
    out = sliced.select(
        "warc_type", "uri", "warc_date", "content_length", "text", "_corrupt"
    )
    if keep_corrupt:
        return out
    return out.filter(
        ~F.col("_corrupt") & (F.col("warc_type") == "conversion")
    ).drop("_corrupt")
