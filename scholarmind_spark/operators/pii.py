"""PII detection and redaction over a text column (training-data
curation extension; no reference counterpart — ScholarMind never scrubs,
but a corpus pipeline at scale must, cf. the C4/CCNet-style cleanup
steps this module's siblings implement).

Pure JVM-side regex (``regexp_count`` / ``regexp_replace``) — no Python
in the hot path, rows never widen, no shuffle: both operators are
map-only projections that pipeline into whatever scan/filter surrounds
them, so cost is one pass over the strings regardless of corpus size.

Patterns are deliberately conservative, dialect-portable (Java regex on
the Spark side, RE2 in the DuckDB twin: no lookaround, no backrefs,
``\\d`` means ASCII digits in both) and applied in a fixed order so a
16-digit card is never half-eaten by the phone pattern.  Precision over
recall: each pattern anchors on ``\\b`` word boundaries and a rigid
shape, so ordinary prose numerals survive.  This is structural PII
(contact/identity strings), not NER — names/addresses need a model and
belong in an ``mapInPandas`` stage like the LLM map (``llm/extract.py``)
if ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (category, pattern, replacement) — applied IN ORDER for redaction:
# email first (its local part may contain digit runs), then dotted quads,
# then the longer digit shapes before the shorter ones they contain.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
]


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one ``n_<category>`` count column per PII pattern plus
    ``n_pii`` (their sum).  Counts are over the RAW text, so overlapping
    categories (an SSN is also phone-shaped if separators align) each
    count what they individually match — use :func:`redact_pii`'s output
    for how many tokens redaction actually consumed."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{cat}")
        for cat, pat, _ in PII_PATTERNS
    ]
    out = df.select("*", *counts)
    total = None
    for cat, _, _ in PII_PATTERNS:
        c = F.col(f"n_{cat}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def with_pii_counts_sql(table: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`with_pii_counts` (RE2 dialect — the patterns
    avoid every construct the dialects disagree on)."""
    cols = ", ".join(
        f"len(regexp_extract_all({text_col}, '{pat}')) AS n_{cat}"
        for cat, pat, _ in PII_PATTERNS
    )
    total = " + ".join(f"len(regexp_extract_all({text_col}, '{pat}'))"
                       for _, pat, _ in PII_PATTERNS)
    return f"SELECT *, {cols}, {total} AS n_pii FROM {table}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with its bracketed placeholder, in the
    fixed :data:`PII_PATTERNS` order (email → ipv4 → card → ssn → phone,
    longest digit shapes first so no partial double-redaction)."""
    col = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(text_col, col)


def redact_pii_sql_expr(text_expr: str) -> str:
    """DuckDB expression twin of :func:`redact_pii` (same order; DuckDB
    needs the explicit ``'g'`` flag — Spark replaces globally by
    default)."""
    expr = text_expr
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr
