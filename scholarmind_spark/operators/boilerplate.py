"""Corpus-level repeated-span removal (C4-style boilerplate scrub).

C4 (Raffel et al., "Exploring the Limits of Transfer Learning with a
Unified Text-to-Text Transformer", JMLR 2020, §2.2) removes any
three-sentence span occurring more than once in the corpus — the classic
defense against boilerplate (cookie banners, nav bars, license footers)
that exact whole-document dedup cannot touch.  This is the WORD-span
generalization for corpora without sentence delimiters: documents are cut
into consecutive non-overlapping ``span_words``-word spans, a span seen
in ≥ ``min_docs`` distinct documents is boilerplate, and every occurrence
of a boilerplate span is removed from every document.

Spark-first shape (engine extension; the reference is a literature tool
with no corpus curation, SURVEY §2):

- span construction is pure array expressions on the JVM
  (``split → sequence → transform(slice)``) — no Python, no UDF;
- one shuffle groups spans for the distinct-doc count; the hot list
  (spans over threshold) is tiny BY CONSTRUCTION — boilerplate is a
  small set of high-frequency strings — so it broadcasts and the removal
  join is a map-side ``left_anti`` (same df-cap pattern as
  ``neardup.ngram_jaccard_pairs``);
- reassembly is one shuffle back on the document id, order restored by
  sorting the (pos, span) structs inside the aggregate — no global sort;
- documents whose every span was boilerplate survive with empty text
  (left join back to the id spine), so the operator never drops rows.

At 100 TB: two shuffles of the span relation (~corpus token volume) and
a broadcast of the hot list; candidate volume is linear in the corpus.
If an adversarial corpus made the hot list large, raise ``min_docs`` —
the list size is monotonically non-increasing in the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spans(text_col: str, span_words: int):
    """List of consecutive non-overlapping ``span_words``-word spans.

    The word array is LET-BOUND (single-element ``transform``) before
    the per-span lambda: an interpreted higher-order lambda re-evaluates
    captured expressions per element, so closing over the raw ``split``
    re-splits the document once per span (see neardup.shingles)."""
    words = F.split(F.col(text_col), " +")

    def spans(w):
        n_spans = F.ceil(F.size(w) / F.lit(span_words)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_spans - F.lit(1)),
            lambda i: F.array_join(
                F.slice(w, i * span_words + F.lit(1), span_words), " "
            ),
        )

    return F.element_at(F.transform(F.array(words), spans), 1)


def repeated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """The boilerplate inventory: every span appearing in ≥ ``min_docs``
    distinct documents, with its document reach and total occurrence
    count — the list a curation owner reviews before scrubbing."""
    s = df.select(
        F.col(id_col).alias("id"),
        F.explode(_spans(text_col, span_words)).alias("span"),
    )
    return (
        s.groupBy("span")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        # no terminal orderBy: inventory consumers order their own views
    )


def scrub_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """``id_col, text_col`` with every boilerplate span (per
    :func:`repeated_span_stats`) removed from every document; span order
    is preserved and fully-scrubbed documents keep an empty string."""
    s = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_spans(text_col, span_words)).alias("pos", "span"),
    )
    hot = (
        s.groupBy("span")
        .agg(F.countDistinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("span")
    )
    # NO broadcast hint: the hot-span list is data-dependent — at
    # min_docs=2 on a real crawl (30%+ duplication) every span with one
    # copy qualifies, a corpus-scale relation.  AQE broadcasts when it is
    # actually small and falls back to a shuffled anti-join when not.
    kept = s.join(hot, on="span", how="left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "span"))),
                lambda x: x["span"],
            ),
            " ",
        ).alias("__scrubbed")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(rebuilt, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("__scrubbed", F.lit("")).alias(text_col),
        )
    )


def _spans_sql(text_col: str, span_words: int) -> tuple[str, str]:
    """DuckDB twins of :func:`_spans`: aligned ``unnest`` expressions for
    (pos, span) — DuckDB aligns same-length unnests positionally."""
    words = f"string_split_regex({text_col}, ' +')"
    n = f"ceil(len({words}) / {span_words}.0)::INT"
    idx = f"range(0, {n})"
    span = (
        f"list_transform({idx}, i -> array_to_string("
        f"{words}[i*{span_words}+1 : i*{span_words}+{span_words}], ' '))"
    )
    return f"unnest({idx})", f"unnest({span})"


def scrub_repeated_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 5,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`scrub_repeated_spans` (same spans, same
    threshold, same single-space reassembly)."""
    pos, span = _spans_sql(text_col, span_words)
    return f"""
WITH s AS (
  SELECT {id_col} AS id, {pos} AS pos, {span} AS span FROM {table}
),
hot AS (
  SELECT span FROM s GROUP BY span HAVING count(DISTINCT id) >= {min_docs}
),
rebuilt AS (
  SELECT id, string_agg(span, ' ' ORDER BY pos) AS __scrubbed
  FROM s WHERE span NOT IN (SELECT span FROM hot)
  GROUP BY id
)
SELECT t.{id_col}, coalesce(r.__scrubbed, '') AS {text_col}
FROM {table} t LEFT JOIN rebuilt r ON r.id = t.{id_col}
"""


def repeated_span_stats_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 5,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`repeated_span_stats`."""
    pos, span = _spans_sql(text_col, span_words)
    return f"""
WITH s AS (
  SELECT {id_col} AS id, {pos} AS pos, {span} AS span FROM {table}
)
SELECT span, count(DISTINCT id) AS n_docs, count(*) AS n_occurrences
FROM s GROUP BY span HAVING count(DISTINCT id) >= {min_docs}
ORDER BY n_docs DESC, span
"""
