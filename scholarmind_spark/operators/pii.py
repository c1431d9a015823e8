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

from pyspark.sql import Column, DataFrame
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


# ------------------------------------------------------- Luhn validation
#
# The shape patterns above trade recall for precision, but a 16-digit
# run in prose (an order id, a barcode) still false-positives as "card".
# Real payment-card numbers carry a Luhn (ISO/IEC 7812) check digit:
# from the RIGHT, double every second digit, subtract 9 from doubles
# > 9, and the grand total must be ≡ 0 (mod 10).  Random digit runs
# pass only 10% of the time, so validating cuts card false positives
# ~10× — the difference between a usable PII report and noise at
# corpus scale.
#
# All-JVM Column math (split → indexed transform → aggregate), RE2-safe
# twin (list_transform over a range of 1-based positions — DuckDB's
# lambda has no index parameter).  Candidates are 13-19 digit runs with
# optional single space/dash separators, the ISO length envelope.

CARD_CANDIDATE_RE = r"\b\d(?:[- ]?\d){12,18}\b"


def luhn_valid(col: Column) -> Column:
    """True iff ``col`` (digits with optional ``-``/space separators) has
    a valid Luhn checksum.  Position parity is taken from the RIGHT
    (0-based index over the reversed digit string; odd indexes double)."""
    digits = F.regexp_replace(col, "[- ]", "")
    chars = F.split(F.reverse(digits), "")
    vals = F.transform(
        chars,
        lambda c, i: F.when(
            i % 2 == 1,
            (F.ascii(c) - 48) * 2
            - F.when((F.ascii(c) - 48) * 2 > 9, F.lit(9)).otherwise(F.lit(0)),
        ).otherwise(F.ascii(c) - 48),
    )
    total = F.aggregate(vals, F.lit(0), lambda acc, x: acc + x)
    # both ends of the ISO envelope: 20+ digit checksum-passing runs
    # (long ids, barcodes) are exactly the noise the validator cuts
    return F.length(digits).between(13, 19) & (total % 10 == 0)


def luhn_valid_sql(expr: str) -> str:
    """DuckDB twin of :func:`luhn_valid` — 1-based positions over the
    reversed digit string, so EVEN positions double (= Spark's odd
    0-based indexes)."""
    digits = f"regexp_replace({expr}, '[- ]', '', 'g')"
    return (
        f"(length({digits}) BETWEEN 13 AND 19 AND list_sum(list_transform("
        f"range(1, length({digits}) + 1), i -> CASE WHEN i % 2 = 0 THEN "
        f"(ascii(reverse({digits})[i]) - 48) * 2 - "
        f"CASE WHEN (ascii(reverse({digits})[i]) - 48) * 2 > 9 THEN 9 ELSE 0 END "
        f"ELSE ascii(reverse({digits})[i]) - 48 END)) % 10 = 0)"
    )


def with_card_validation(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_card_candidates`` (13-19 digit runs, separators
    allowed) and ``n_card_luhn_valid`` (those passing the checksum) —
    the validated count is the one a PII report should surface."""
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(CARD_CANDIDATE_RE), F.lit(0)
    )
    valid = F.filter(cands, luhn_valid)
    return df.select(
        "*",
        F.size(cands).alias("n_card_candidates"),
        F.size(valid).alias("n_card_luhn_valid"),
    )


def with_card_validation_sql(table: str, text_col: str = "text") -> str:
    """DuckDB twin of :func:`with_card_validation`."""
    cands = f"regexp_extract_all({text_col}, '{CARD_CANDIDATE_RE}')"
    return (
        f"SELECT *, len({cands}) AS n_card_candidates, "
        f"len(list_filter({cands}, c -> {luhn_valid_sql('c')})) "
        f"AS n_card_luhn_valid FROM {table}"
    )
