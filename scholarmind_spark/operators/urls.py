"""URL canonicalization and URL-level dedup (engine extension, SURVEY §2).

Web-corpus curation dedups by URL before anything content-based
(RefinedWeb §3.2 removes exact-URL revisits first; C4 and CCNet key
their crawls by URL) — but raw crawl URLs name the same resource many
ways.  ``canonical_url`` normalizes the differences that never change
the resource:

1. scheme and host lowered; leading ``www.`` stripped
2. default port stripped (``:80`` for http, ``:443`` for https)
3. trailing ``/`` stripped from the path (root path becomes empty)
4. fragment dropped (never sent to the server)
5. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``, ``mc_cid``, ``mc_eid``); survivors SORTED so param order
   does not split a key; an emptied query drops its ``?``

Path case is preserved (paths are case-sensitive); non-http(s) inputs
and unparseable strings pass through unchanged (a filter can drop them
separately — silently rewriting garbage would hide feed corruption).

Everything is built-in Column regex/array expressions — JVM-side, fully
codegen, no UDF — and the DuckDB twin runs the identical chain, so the
gate compares bit-for-bit.  ``url_dedup`` is then a hash-groupBy keep-
min-id on the canonical key: one shuffle on a high-entropy key, the
same shape as ``dedup.dedup_exact``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one regex, five capture groups: scheme, host[:port], path, ?query, #frag
# — the scheme group is case-insensitive ('HTTPS://x' is a valid spelling;
# Java regex and RE2 both accept the inline (?i:...) group).  End anchors
# are \z (true end-of-text in BOTH Java and RE2), never $: Java '$'
# matches before a trailing newline while RE2's does not, so a URL field
# with a stray trailing '\n' would canonicalize on Spark but pass through
# on the DuckDB twin — an engine-divergent key.
URL_PARTS_RE = r"^((?i:https?))://([^/?#]+)([^?#]*)(\?[^#]*)?(#(?s:.)*)?\z"

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref|mc_cid|mc_eid)(=(?s:.)*)?\z"


def canonical_url(col: Column) -> Column:
    scheme = F.lower(F.regexp_extract(col, URL_PARTS_RE, 1))
    host0 = F.regexp_replace(
        F.lower(F.regexp_extract(col, URL_PARTS_RE, 2)), "^www\\.", ""
    )
    host = F.when(
        scheme == "http", F.regexp_replace(host0, ":80\\z", "")
    ).otherwise(F.regexp_replace(host0, ":443\\z", ""))
    path = F.regexp_replace(
        F.regexp_extract(col, URL_PARTS_RE, 3), "/+\\z", ""
    )
    qraw = F.regexp_extract(col, URL_PARTS_RE, 4)
    kept = F.array_sort(
        F.filter(
            F.split(F.substring(qraw, 2, 1_000_000), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        (qraw == "") | qraw.isNull() | (F.size(kept) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(kept, "&")))
    canon = F.concat(scheme, F.lit("://"), host, path, query)
    # non-http(s) / unparseable → unchanged
    return F.when(scheme == "", col).otherwise(canon)


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` — same regex, same ordering."""
    scheme = f"lower(regexp_extract({expr}, '{URL_PARTS_RE}', 1))"
    host0 = (
        f"regexp_replace(lower(regexp_extract({expr}, '{URL_PARTS_RE}', 2)),"
        f" '^www\\.', '')"
    )
    host = (
        f"CASE WHEN {scheme} = 'http'"
        f" THEN regexp_replace({host0}, ':80\\z', '')"
        f" ELSE regexp_replace({host0}, ':443\\z', '') END"
    )
    path = (
        f"regexp_replace(regexp_extract({expr}, '{URL_PARTS_RE}', 3),"
        f" '/+\\z', '')"
    )
    qraw = f"regexp_extract({expr}, '{URL_PARTS_RE}', 4)"
    kept = (
        f"list_sort(list_filter(string_split(substring({qraw}, 2), '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    query = (
        f"CASE WHEN {qraw} = '' OR {qraw} IS NULL OR len({kept}) = 0"
        f" THEN '' ELSE '?' || array_to_string({kept}, '&') END"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN {expr}"
        f" ELSE {scheme} || '://' || {host} || {path} || {query} END"
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per canonical URL (minimum ``id_col`` wins) — the
    crawl-revisit dedup that runs before any content dedup.  One shuffle
    on the canonical key; survivor choice is an aggregation (map-side
    combinable), then a semi-join back, same shape as ``dedup_exact``.

    Null/empty URLs are EXEMPT — a row that merely lacks a URL is not a
    revisit of every other URL-less row.  Each gets a unique synthetic
    key (\\x00 + id; NUL cannot appear in a real URL), the same
    single-row-group device as ``priority_dedup``'s empty-DOI handling —
    which also keeps the groupBy skew-free where null URLs are common."""
    cu = canonical_url(F.col(url_col))
    keyed = df.withColumn(
        "__cu",
        F.when(
            cu.isNull() | (cu == ""),
            F.concat(F.lit("\x00"), F.col(id_col).cast("string")),
        ).otherwise(cu),
    )
    keep = (
        keyed.groupBy("__cu")
        .agg(F.min(id_col).alias(id_col))
        .drop("__cu")
    )
    return df.join(keep, on=id_col, how="left_semi")
