"""Text-analysis operators for training-data pipelines (engine extension,
BASELINE.json north star): language-ID, quality scoring, token counting,
document fingerprinting.

Everything is built-in Column expressions (JVM, whole-stage codegen) — no
Python in the hot path.  Each helper has a ``*_sql`` twin emitting the
identical computation as DuckDB SQL for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Explicit whitespace class instead of \s: Java's \s includes \x0B
# (vertical tab) while RE2's does not, so every paired Spark/DuckDB regex
# must spell the class out or the twins diverge on \x0B-bearing text.
WS_CLASS = r" \t\n\x0B\f\r"
TOKEN_SPLIT_RE = f"[{WS_CLASS}]+"
# BPE-ish word/number/symbol pre-tokenizer (public GPT-2 style, simplified)
BPE_RE = f"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_CLASS}]"
PUNCT_RE = f"[^\\w{WS_CLASS}]"

# tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "和", "在"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break order


def tokens(col: Column) -> Column:
    return F.split(col, TOKEN_SPLIT_RE)


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish pre-tokenizer count (regexp, JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_RE), F.lit(0)))


def punct_ratio(col: Column) -> Column:
    return F.round(
        F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), F.lit(0)))
        / F.greatest(F.length(col), F.lit(1)),
        6,
    )


def stopword_count(col: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, F.lower(t))))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return F.round(stopword_count(col, lang) / F.greatest(token_count(col), F.lit(1)), 6)


def quality_score(col: Column) -> Column:
    """Heuristic doc-quality score in [0,1]: rewards reasonable length and
    stopword presence, penalizes punctuation soup.  Deterministic, rounded."""
    n_tok = token_count(col)
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(
        stopword_count(col, "en") / F.greatest(n_tok, F.lit(1)) * F.lit(5.0),
        F.lit(1.0),
    )
    punct_term = F.lit(1.0) - F.least(
        F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), F.lit(0)))
        / F.greatest(F.length(col), F.lit(1)) * F.lit(4.0),
        F.lit(1.0),
    )
    return F.round((length_term + stop_term + punct_term) / F.lit(3.0), 6)


CJK_RE = "[\u4e00-\u9fff]"  # literal Han range — valid in Java and RE2


def lang_scores(col: Column) -> dict[str, Column]:
    toks = tokens(col)
    out = {}
    for lang in LANG_ORDER:
        if lang == "zh":
            # Chinese is not whitespace-segmented, so stopword TOKEN
            # matching can never fire (the old zh entry was dead and
            # Chinese prose scored 'und'); count Han characters instead
            out[lang] = F.size(
                F.regexp_extract_all(col, F.lit(CJK_RE), F.lit(0))
            )
            continue
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return out


def lang_id(col: Column) -> Column:
    """Stopword-overlap language heuristic; first language (LANG_ORDER) with
    the maximal score wins; all-zero scores → 'und'."""
    scores = lang_scores(col)
    mx = F.greatest(*scores.values())
    expr: Column = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when(scores[lang] == mx, F.lit(lang)).otherwise(expr)
    return F.when(mx == 0, F.lit("und")).otherwise(expr)


def fingerprint(col: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token multiset — catches shuffled near-identical docs cheaply."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


# Scrub patterns (applied in this order; identical RE2/Java-regex subset so
# Spark and DuckDB rewrite byte-identically)
URL_RE = f"https?://[^{WS_CLASS}]+"
EMAIL_RE = r"[A-Za-z0-9.+_-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+"
LONG_NUM_RE = r"[0-9]{7,}"


def clean_text(col: Column) -> Column:
    """Pretraining-style text scrub: drop URLs, mask emails → ``<EMAIL>``
    and long digit runs (phone/ID-ish PII) → ``<NUM>``, collapse whitespace.
    Pure JVM regexp chain — the canonical pre-tokenization cleanup stage."""
    c = F.regexp_replace(col, URL_RE, "")
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, LONG_NUM_RE, "<NUM>")
    return F.trim(F.regexp_replace(c, TOKEN_SPLIT_RE, " "))


def token_topk(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Corpus vocabulary: top-k lowercased whitespace tokens by frequency
    (ties broken by token, fully deterministic).

    explode → groupBy(token) runs with map-side partial aggregation, so the
    shuffle carries one row per (token, partition) — vocabulary building at
    100 TB is exactly this plan plus a min-count filter."""
    tok = df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
    return (
        tok.filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(k)
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_bpe_tokens": bpe_token_count(c),
            "punct_ratio": punct_ratio(c),
            "stopword_ratio": stopword_ratio(c),
            "quality_score": quality_score(c),
            "lang_pred": lang_id(c),
            "fingerprint": fingerprint(c),
        }
    )


# ---------------------------------------------------------------- SQL twins

def tokens_sql(expr: str) -> str:
    return f"string_split_regex({expr}, '{TOKEN_SPLIT_RE}')"


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_RE}'))"


def punct_ratio_sql(expr: str) -> str:
    return (
        f"round(len(regexp_extract_all({expr}, '{PUNCT_RE}'))::DOUBLE"
        f" / greatest(length({expr}), 1), 6)"
    )


def stopword_count_sql(expr: str, lang: str = "en") -> str:
    words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"len(list_filter({tokens_sql(expr)},"
        f" t -> list_contains([{words}], lower(t))))"
    )


def stopword_ratio_sql(expr: str, lang: str = "en") -> str:
    return (
        f"round({stopword_count_sql(expr, lang)}::DOUBLE"
        f" / greatest({token_count_sql(expr)}, 1), 6)"
    )


def quality_score_sql(expr: str) -> str:
    n_tok = token_count_sql(expr)
    punct = f"len(regexp_extract_all({expr}, '{PUNCT_RE}'))"
    return (
        "round(("
        f"least({n_tok} / 100.0, 1.0)"
        f" + least({stopword_count_sql(expr)}::DOUBLE / greatest({n_tok}, 1) * 5.0, 1.0)"
        f" + (1.0 - least({punct}::DOUBLE / greatest(length({expr}), 1) * 4.0, 1.0))"
        ") / 3.0, 6)"
    )


def lang_id_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    score = {}
    for lang in LANG_ORDER:
        if lang == "zh":  # Han-char count — see lang_scores
            score[lang] = f"len(regexp_extract_all({expr}, '{CJK_RE}'))"
            continue
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        score[lang] = f"len(list_filter({toks}, t -> list_contains([{words}], lower(t))))"
    mx = f"greatest({', '.join(score.values())})"
    whens = " ".join(
        f"WHEN {score[lang]} = {mx} THEN '{lang}'" for lang in LANG_ORDER
    )
    return f"CASE WHEN {mx} = 0 THEN 'und' {whens} ELSE 'und' END"


def fingerprint_sql(expr: str) -> str:
    return f"md5(array_to_string(list_sort(list_distinct({tokens_sql(expr)})), ' '))"


def clean_text_sql(expr: str) -> str:
    c = f"regexp_replace({expr}, '{URL_RE}', '', 'g')"
    c = f"regexp_replace({c}, '[A-Za-z0-9.+_-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+', '<EMAIL>', 'g')"
    c = f"regexp_replace({c}, '[0-9]{{7,}}', '<NUM>', 'g')"
    return f"trim(regexp_replace({c}, '{TOKEN_SPLIT_RE}', ' ', 'g'))"


def token_topk_sql(table: str, text_col: str = "text", k: int = 20) -> str:
    return f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({tokens_sql(f"lower({text_col})")}) AS token FROM {table})
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT {k}
"""


def word_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: word count, distinct
    words, top-word fraction, and the fraction of words that are repeats.

    Shape for 100 TB: explode words → two cascaded aggregations, both with
    map-side partial agg; the shuffle key is (doc, word) so skew follows
    document size, not corpus size.  Ratios divide EXACT integer counts as
    doubles (engine-order independent).  Returns ``id, n_words,
    n_distinct, top_word_frac, dup_word_frac``."""
    w = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    per = w.groupBy("id", "w").agg(F.count("*").alias("c"))
    return (
        per.groupBy("id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_c"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).alias("dup_c"),
        )
        .select(
            "id",
            "n_words",
            "n_distinct",
            F.round(F.col("top_c").cast("double") / F.col("n_words").cast("double"), 6).alias("top_word_frac"),
            F.round(F.col("dup_c").cast("double") / F.col("n_words").cast("double"), 6).alias("dup_word_frac"),
        )
        # no terminal orderBy: corpus-sized presentation sort
    )


def word_repetition_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
WITH w AS (
  SELECT {id_col} AS id, unnest({tokens_sql(text_col)}) AS w FROM {table}
),
per AS (
  SELECT id, w, count(*) AS c FROM w WHERE w <> '' GROUP BY id, w
)
SELECT id, sum(c)::BIGINT AS n_words, count(*) AS n_distinct,
       round(max(c)::DOUBLE / sum(c)::DOUBLE, 6) AS top_word_frac,
       round(coalesce(sum(CASE WHEN c > 1 THEN c END), 0)::DOUBLE / sum(c)::DOUBLE, 6) AS dup_word_frac
FROM per GROUP BY id ORDER BY id
"""


def doc_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k distinctive terms per document: rank by term frequency DESC,
    document frequency ASC (the TF-IDF ordering with EXACT integer keys —
    no float idf, so both engines rank identically; term ASC breaks ties).

    Shape: explode → (doc, term) counts → vocabulary-sized document-
    frequency table joined back (AQE broadcasts it when small; no forced
    hint — web-scale vocabularies are unbounded) → per-doc window.
    Returns ``id, term, tf, df, rank``."""
    from scholarmind_spark.util import attach_caches

    w = (
        df.select(
            F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
        )
        .filter(F.col("term") != "")
    )
    # persisted: tf (the corpus explode + aggregate, the dominant stages)
    # feeds BOTH the document-frequency aggregate and the join's left
    # side — same pattern as collocations/bm25
    tf = w.groupBy("id", "term").agg(F.count("*").alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    win = Window.partitionBy("id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    out = (
        # no broadcast hint: dfreq is vocabulary-sized (unbounded in the
        # data); AQE broadcasts it only when actually small
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "df", "rank")
        # no terminal orderBy: the top-k relation is still corpus-sized
    )
    return attach_caches(out, [tf])


def doc_top_terms_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> str:
    return f"""
WITH w AS (
  SELECT {id_col} AS id, unnest({tokens_sql(text_col)}) AS term FROM {table}
),
tf AS (
  SELECT id, term, count(*) AS tf FROM w WHERE term <> '' GROUP BY id, term
),
dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
ranked AS (
  SELECT id, tf.term, tf, df,
         row_number() OVER (PARTITION BY id
                            ORDER BY tf DESC, df ASC, tf.term ASC) AS rank
  FROM tf JOIN dfreq ON tf.term = dfreq.term
)
SELECT id, term, tf, df, rank::INT AS rank
FROM ranked WHERE rank <= {k} ORDER BY id, rank
"""


URL_HOST_RE = f"https?://([^/{WS_CLASS}]+)"


def url_domain_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-domain corpus statistics: documents mentioning the domain and
    total URL mentions — the inventory behind domain blocklist/allowlist
    filtering in web-corpus curation (C4/RefinedWeb-style).

    Domains are the host part of every http(s) URL in the text, lowered,
    with a leading ``www.`` stripped.  Pure JVM expressions (regex extract
    → explode → aggregate); one shuffle on the domain."""
    hosts = F.transform(
        F.regexp_extract_all(F.col(text_col), F.lit(URL_HOST_RE), F.lit(1)),
        lambda h: F.regexp_replace(F.lower(h), "^www\\.", ""),
    )
    e = df.select(F.col(id_col).alias("id"), F.explode(hosts).alias("domain"))
    return (
        e.groupBy("domain")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count("*").alias("n_urls"),
        )
        # no terminal orderBy: presentation sort (gates/CLI order their
        # own bounded outputs)
    )


def url_domain_stats_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
WITH e AS (
  SELECT {id_col} AS id,
         regexp_replace(lower(unnest(
           regexp_extract_all({text_col}, '{URL_HOST_RE}', 1)
         )), '^www\\.', '') AS domain
  FROM {table}
)
SELECT domain, count(DISTINCT id) AS n_docs, count(*) AS n_urls
FROM e GROUP BY domain ORDER BY n_docs DESC, domain
"""


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the character distribution —
    the gibberish/compression quality signal: natural text sits in a
    narrow entropy band, while key-mash, base64 blobs, and single-char
    padding fall outside it (low entropy = repetitive, high = random).

    Cross-engine exact via the q_micro device at TWO levels: the per-char
    ``cnt·ln(cnt)`` terms are quantized to int64 micros BEFORE the
    per-doc sum (float addition order never crosses an engine), and the
    final ``H = ln(n) − Σcnt·ln(cnt)/n`` is recomputed from those integer
    sums in one fixed-order float expression, rounded to micros.

    Two shuffles of the (doc, char) relation — linear in corpus chars;
    the per-doc char alphabet is tiny so the second aggregate is
    map-side-combining on ≤ alphabet rows per doc."""
    # NOT "." — Java dot excludes \r/\u0085/\u2028/\u2029 while RE2 dot
    # excludes only \n; [^\n] is the one class both dialects agree on
    chars = F.regexp_extract_all(F.col(text_col), F.lit(r"[^\n]"), F.lit(0))
    e = df.select(F.col(id_col).alias("id"), F.explode(chars).alias("ch"))
    per_char = e.groupBy("id", "ch").agg(F.count("*").alias("cnt"))
    term_micro = F.round(
        F.col("cnt") * F.log(F.col("cnt")) * F.lit(1000000.0)
    ).cast("bigint")
    per_doc = per_char.groupBy("id").agg(
        F.sum("cnt").alias("n_chars"),
        F.sum(term_micro).alias("__s_micro"),
    )
    h = F.log(F.col("n_chars")) - (F.col("__s_micro") / F.lit(1000000.0)) / F.col(
        "n_chars"
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.round(h * F.lit(1000000.0)).cast("bigint").alias("entropy_micro"),
    )


def char_entropy_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`char_entropy` (same char extraction, same
    two-level micro-int quantization, same fixed-order float math)."""
    return f"""
WITH e AS (
  SELECT {id_col} AS id, unnest(regexp_extract_all({text_col}, '[^\n]')) AS ch
  FROM {table}
),
per_char AS (
  SELECT id, ch, count(*) AS cnt FROM e GROUP BY id, ch
),
per_doc AS (
  SELECT id,
         sum(cnt)::BIGINT AS n_chars,
         sum(round(cnt * ln(cnt) * 1000000.0::DOUBLE)::BIGINT)::BIGINT AS s_micro
  FROM per_char GROUP BY id
)
SELECT id AS {id_col}, n_chars,
       round((ln(n_chars) - (s_micro / 1000000.0::DOUBLE) / n_chars)
             * 1000000.0::DOUBLE)::BIGINT AS entropy_micro
FROM per_doc
"""
