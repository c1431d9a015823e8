"""URL canonicalization / URL-level dedup (operators/urls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scholarmind_spark.operators.urls import canonical_url, url_dedup


def canon(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonical_url(F.col("u")).alias("c")).collect()[0].c


def test_host_case_www_port_slash(spark):
    assert canon(spark, "https://Example.org/Path/") == "https://example.org/Path"
    assert canon(spark, "https://www.example.org:443/a") == "https://example.org/a"
    assert canon(spark, "http://example.org:80/a") == "http://example.org/a"
    # non-default port preserved; path case preserved
    assert canon(spark, "https://example.org:8443/A") == "https://example.org:8443/A"
    # root path collapses to empty
    assert canon(spark, "https://example.org/") == "https://example.org"


def test_query_fragment_tracking(spark):
    assert canon(spark, "https://e.org/a#frag") == "https://e.org/a"
    # tracking-only query drops its '?'
    assert canon(spark, "https://e.org/a?utm_source=x&fbclid=1") == "https://e.org/a"
    # surviving params sort; tracking params drop
    assert (
        canon(spark, "https://e.org/a?b=2&utm_campaign=z&a=1")
        == "https://e.org/a?a=1&b=2"
    )


def test_non_http_passthrough(spark):
    for u in ("ftp://example.org/x", "not a url", ""):
        assert canon(spark, u) == u


def test_url_dedup_keeps_min_id_per_canonical(spark):
    rows = [
        (1, "https://Example.org/a/"),
        (2, "https://www.example.org/a?utm_source=t"),
        (3, "https://example.org/a#f"),
        (4, "https://example.org/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df)
    assert sorted(r.doc_id for r in out.collect()) == [1, 4]


def test_uppercase_scheme_canonicalizes(spark):
    assert canon(spark, "HTTPS://Example.org/a/") == "https://example.org/a"
    assert canon(spark, "HTTP://example.org:80/a") == "http://example.org/a"
