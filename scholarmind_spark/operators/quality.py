"""Gopher-style document quality rules (engine extension, SURVEY §2).

Reimplements the canonical repetition-free quality filter set published
with Gopher (Rae et al., "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher", 2021, §A1.1) — the rule battery most
open corpus pipelines (MassiveText, RefinedWeb, Dolma) apply before
anything model-based:

- word count within [min_words, max_words]
- mean word length within [3, 10] characters
- < 10% of words are symbol-ish (``#`` or ``...``)
- < 90% of lines start with a bullet
- < 30% of lines end with an ellipsis
- ≥ 80% of words contain at least one alphabetic character
- at least 2 of the 8 Gopher stop words appear

Cross-engine exactness: every ratio threshold is CLEARED of division —
``mean_len ∈ [3,10]`` becomes ``3·n ≤ chars ≤ 10·n``, ``ratio < 0.1``
becomes ``10·k < n`` — so the flags are pure integer predicates and the
DuckDB oracle matches bit-for-bit (no float, no rounding, no engine
division semantics anywhere).

Spark-first shape: one projection of higher-order array expressions
(split → filter → aggregate) per document, fully inside whole-stage
codegen, zero shuffles and zero Python — at 100 TB this is scan-bound,
exactly what a per-row filter must be.  Regexes use the spelled-out
whitespace class from textstats (Java ``\\s`` ≠ RE2 ``\\s`` on \\x0B).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.textstats import TOKEN_SPLIT_RE, tokens_sql

# Gopher §A1.1 stop word list (8 words; a kept doc must contain ≥ 2)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-document Gopher rule booleans + the combined ``keep`` flag.

    Output: ``id_col, n_words, n_lines, f_word_count, f_mean_word_len,
    f_symbol, f_bullet, f_ellipsis, f_alpha, f_stop, keep``.
    """
    col = F.col(text_col)
    words = F.filter(F.split(col, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))
    lines = F.split(col, "\n")
    lowered = F.transform(words, F.lower)

    base = df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.coalesce(
            F.aggregate(
                words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            ),
            F.lit(0),
        ).alias("n_chars"),
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).alias(
            "n_alpha"
        ),
        F.size(
            F.filter(words, lambda w: w.contains("#") | w.contains("..."))
        ).alias("n_symbol"),
        F.size(lines).alias("n_lines"),
        F.size(F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]"))).alias(
            "n_bullet"
        ),
        F.size(
            F.filter(lines, lambda l: F.trim(l).rlike("(\\.\\.\\.|…)$"))
        ).alias("n_ellipsis"),
        sum(
            (
                F.when(F.array_contains(lowered, w), 1).otherwise(0)
                for w in GOPHER_STOPWORDS
            ),
            F.lit(0),
        ).alias("stop_hits"),
    )
    flags = base.select(
        id_col,
        "n_words",
        "n_lines",
        (
            (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        ).alias("f_word_count"),
        # 3 ≤ chars/words ≤ 10, cleared of division (exact integers)
        (
            (F.lit(3) * F.col("n_words") <= F.col("n_chars"))
            & (F.col("n_chars") <= F.lit(10) * F.col("n_words"))
        ).alias("f_mean_word_len"),
        (F.lit(10) * F.col("n_symbol") < F.col("n_words")).alias("f_symbol"),
        (F.lit(10) * F.col("n_bullet") < F.lit(9) * F.col("n_lines")).alias(
            "f_bullet"
        ),
        (F.lit(10) * F.col("n_ellipsis") < F.lit(3) * F.col("n_lines")).alias(
            "f_ellipsis"
        ),
        (F.lit(5) * F.col("n_alpha") >= F.lit(4) * F.col("n_words")).alias(
            "f_alpha"
        ),
        (F.col("stop_hits") >= 2).alias("f_stop"),
    )
    flag_cols = [
        "f_word_count",
        "f_mean_word_len",
        "f_symbol",
        "f_bullet",
        "f_ellipsis",
        "f_alpha",
        "f_stop",
    ]
    keep_expr = F.col(flag_cols[0])
    for c in flag_cols[1:]:
        keep_expr = keep_expr & F.col(c)
    return flags.withColumn("keep", keep_expr)


def gopher_quality_flags_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> str:
    """DuckDB twin of :func:`gopher_quality_flags` — same spelled-out
    whitespace class, same cleared-integer thresholds."""
    stop_sum = " + ".join(
        f"(CASE WHEN list_contains(lw, '{w}') THEN 1 ELSE 0 END)"
        for w in GOPHER_STOPWORDS
    )
    return f"""
WITH __w AS (
  SELECT {id_col},
         list_filter({tokens_sql(text_col)}, t -> t <> '') AS words,
         list_transform(list_filter({tokens_sql(text_col)}, t -> t <> ''),
                        w -> lower(w)) AS lw,
         string_split({text_col}, chr(10)) AS lines
  FROM {table}
),
__m AS (
  SELECT {id_col},
         len(words)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(words, w -> length(w))), 0)::BIGINT
           AS n_chars,
         len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))::BIGINT
           AS n_alpha,
         len(list_filter(words,
             w -> contains(w, '#') OR contains(w, '...')))::BIGINT AS n_symbol,
         len(lines)::BIGINT AS n_lines,
         len(list_filter(lines,
             l -> regexp_matches(trim(l), '^[-*•]')))::BIGINT AS n_bullet,
         len(list_filter(lines,
             l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$')))::BIGINT
           AS n_ellipsis,
         ({stop_sum}) AS stop_hits
  FROM __w
)
SELECT {id_col}, n_words, n_lines,
       (n_words >= {min_words} AND n_words <= {max_words}) AS f_word_count,
       (3 * n_words <= n_chars AND n_chars <= 10 * n_words) AS f_mean_word_len,
       (10 * n_symbol < n_words) AS f_symbol,
       (10 * n_bullet < 9 * n_lines) AS f_bullet,
       (10 * n_ellipsis < 3 * n_lines) AS f_ellipsis,
       (5 * n_alpha >= 4 * n_words) AS f_alpha,
       (stop_hits >= 2) AS f_stop,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND 3 * n_words <= n_chars AND n_chars <= 10 * n_words
        AND 10 * n_symbol < n_words
        AND 10 * n_bullet < 9 * n_lines
        AND 10 * n_ellipsis < 3 * n_lines
        AND 5 * n_alpha >= 4 * n_words
        AND stop_hits >= 2) AS keep
FROM __m"""
