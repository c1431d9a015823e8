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
        # symbol OCCURRENCES (Gopher's symbol-to-word ratio counts each
        # '#' / '...' hit, not each word containing one); neither pattern
        # can span the whitespace token split, so counting over the raw
        # text equals the per-word sum — and skips the array filter.
        # replace() removal is left-to-right non-overlapping in both
        # engines, so the '...' count ('....' → 1) matches the twin.
        (
            (F.length(col) - F.length(F.replace(col, F.lit("#"))))
            + (
                (F.length(col) - F.length(F.replace(col, F.lit("..."))))
                / F.lit(3)
            ).cast("long")
        ).cast("long").alias("n_symbol"),
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
         {text_col},
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
         ((length({text_col}) - length(replace({text_col}, '#', '')))
          + (length({text_col}) - length(replace({text_col}, '...', ''))) // 3
         )::BIGINT AS n_symbol,
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


# --- Gopher repetition battery (Rae et al. 2021, Table A1) ---------------

# thresholds as integer PERCENTS (a doc is dropped when its fraction
# EXCEEDS the threshold): top n-gram char fraction for n=2..4, duplicate
# n-gram char fraction for n=5..10
GOPHER_TOP_THR = {2: 20, 3: 18, 4: 16}
GOPHER_DUP_THR = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


# rolling-polynomial gram-hash constants (same on BOTH engines): token
# hashes reduced mod the Mersenne prime M, combined with powers of W
GOPHER_HASH_M = (1 << 31) - 1
GOPHER_W = 1_000_003
GOPHER_W_POW = [pow(GOPHER_W, j, GOPHER_HASH_M) for j in range(10)]


def gopher_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher's repetition filters: per document, the character fraction
    of the MOST FREQUENT word n-gram (n = 2..4) and of ALL DUPLICATED
    word n-grams (n = 5..10), plus the combined ``keep`` flag.

    Pinned definitions (cross-engine exact, all integers):

    - gram chars = characters of the joined n-gram (token lengths + n−1
      separators); doc chars = ``length(text)`` (≥ 1 guard);
    - top fraction  = count(top gram) · len(top gram) / doc_chars, top
      gram chosen by (count, len, hash) descending — deterministic ties;
    - dup fraction  = Σ over grams with count > 1 of count · len / doc
      chars (occurrences counted without overlap dedup — the common
      reimplementation, e.g. NVIDIA NeMo Curator; the paper's wording is
      ambiguous on overlaps and this choice is documented);
    - fractions are reported in integer MICRO units (``· 1e6 div
      chars``), and each flag is the division-free comparison
      ``chars_metric · 100 ≤ thr_pct · doc_chars``.

    Spark-first shape — built for whole-stage codegen, NOT higher-order
    array lambdas (an earlier gram-string explode spent 24 s at sf0.1
    inside interpreted ``transform``/``slice`` evaluation): ONE token
    posexplode, md5-hash each token once, then a single window pass per
    doc computes all nine gram identities as ROLLING POLYNOMIAL HASHES
    of the next n token hashes (``Σ th_j · W^j mod M`` over ``lead()``
    columns — pure codegen integer math; both engines run the identical
    formula, so grams align bit-for-bit).  The nine hash/length prefix
    sums are materialized as columns in ONE Project before the
    ``stack`` unpivot, so each stack arm is a 2-term expression instead
    of re-deriving up to 10 multiply-mods (r15: the arm-local expansion
    made the Generate stage the query's hotspot — 54 modular products
    per input row and a codegen body big enough to hurt JIT; isolated
    sf0.1 median 7.0 s → 4.0 s with identical results).  Then one count
    shuffle on 8-byte keys and ONE aggregate straight back to a row per
    doc: the per-(doc, n) top gram is ``max(struct(c, glen, h))`` — the
    lexicographic struct max IS the old ``row_number`` winner under
    ``(c, glen, h) DESC`` — so the rank window (a full Sort of the gram
    counts) and the intermediate per-(doc, n) aggregate both disappear.
    Gram identity is the 31-bit rolling hash: two distinct grams
    colliding within one (doc, n) group would merge (p ≈ grams²/2³²
    per doc — negligible, and identical on both engines).  Docs shorter
    than n tokens (or empty) rejoin from the spine with zero metrics
    and ``keep`` true.
    """
    from pyspark.sql.window import Window

    from scholarmind_spark.operators.neardup import minhash_base
    from scholarmind_spark.operators.textstats import TOKEN_SPLIT_RE as _TSR

    toks = F.filter(F.split(F.col(text_col), _TSR), lambda t: t != F.lit(""))
    spine = df.select(
        F.col(id_col).alias("id"),
        F.greatest(F.length(F.col(text_col)), F.lit(1)).alias("n_chars"),
    )
    t = df.select(
        F.col(id_col).alias("id"),
        F.greatest(F.length(F.col(text_col)), F.lit(1)).alias("n_chars"),
        F.posexplode(toks).alias("pos", "tok"),
    ).select(
        "id",
        "n_chars",
        "pos",
        (minhash_base(F.col("tok")) % GOPHER_HASH_M).alias("th"),
        F.length("tok").cast("long").alias("tl"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    lead_cols = []
    for j in range(10):
        lead_cols.append(F.lead("th", j).over(w).alias(f"__th{j}"))
        lead_cols.append(F.lead("tl", j).over(w).alias(f"__tl{j}"))
    led = t.select("id", "n_chars", *lead_cols)
    # one Project of the 9 hash/length prefix sums: each weighted product
    # ((th_j · W^j) mod M) appears once and the arms reuse the sums —
    # the stack arms below collapse to (n, hs % M, ls + n−1)
    prods = [
        f"((__th{j} * {GOPHER_W_POW[j]}) % {GOPHER_HASH_M})" for j in range(10)
    ]
    sums = led.selectExpr(
        "id",
        "n_chars",
        *[f"({' + '.join(prods[:n])}) AS __hs{n}" for n in range(2, 11)],
        *[
            f"({' + '.join(f'__tl{j}' for j in range(n))}) AS __ls{n}"
            for n in range(2, 11)
        ],
    )
    stack_args = [
        f"{n}, (__hs{n} % {GOPHER_HASH_M}), (__ls{n} + {n - 1})"
        for n in range(2, 11)
    ]
    stacked = sums.selectExpr(
        "id",
        "n_chars",
        f"stack(9, {', '.join(stack_args)}) AS (n, h, glen)",
    ).filter(F.col("glen").isNotNull())  # lead past doc end → incomplete gram
    counted = stacked.groupBy("id", "n_chars", "n", "glen", "h").agg(
        F.count("*").alias("c")
    )
    # single aggregate to a row per doc; the per-(doc, n) top gram is the
    # lexicographic max of struct(c, glen, h) — exactly the rn = 1 row of
    # the former row_number() OVER (ORDER BY c DESC, glen DESC, h DESC)
    aggs = [F.max("n_chars").alias("__nc")]
    for n in GOPHER_TOP_THR:
        aggs.append(
            F.max(
                F.when(F.col("n") == n, F.struct("c", "glen", "h"))
            ).alias(f"__top{n}")
        )
    for n in GOPHER_DUP_THR:
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("n") == n) & (F.col("c") > 1),
                        F.col("c") * F.col("glen"),
                    )
                ),
                F.lit(0),
            ).alias(f"__d{n}")
        )
    collapsed = counted.groupBy("id").agg(*aggs)
    joined = spine.join(collapsed, "id", "left")
    nc = F.coalesce(F.col("__nc"), F.col("n_chars"))
    out_cols = [F.col("id").alias(id_col)]
    keep = F.lit(True)
    for n, thr in GOPHER_TOP_THR.items():
        chars = F.coalesce(
            F.col(f"__top{n}.c") * F.col(f"__top{n}.glen"), F.lit(0)
        )
        out_cols.append((chars * 1_000_000).cast("long").alias(f"__m_t{n}"))
        keep = keep & (chars * 100 <= F.lit(thr) * nc)
    for n, thr in GOPHER_DUP_THR.items():
        chars = F.coalesce(F.col(f"__d{n}"), F.lit(0))
        out_cols.append((chars * 1_000_000).cast("long").alias(f"__m_d{n}"))
        keep = keep & (chars * 100 <= F.lit(thr) * nc)
    step = joined.select(*out_cols, nc.alias("__nc2"), keep.alias("keep"))
    final_cols = [id_col]
    for n in GOPHER_TOP_THR:
        final_cols.append(F.expr(f"__m_t{n} div __nc2").alias(f"top{n}_micro"))
    for n in GOPHER_DUP_THR:
        final_cols.append(F.expr(f"__m_d{n} div __nc2").alias(f"dup{n}_micro"))
    final_cols.append("keep")
    return step.select(*final_cols)


def gopher_repetition_stats_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`gopher_repetition_stats` — the identical
    rolling-polynomial gram hashes (same W, M, powers), tie-break, and
    cleared-integer flags."""
    from scholarmind_spark.operators.textstats import TOKEN_SPLIT_RE as _TSR

    lead_cols = ",\n         ".join(
        f"lead(th, {j}) OVER w AS th{j}, lead(tl, {j}) OVER w AS tl{j}"
        for j in range(10)
    )
    arms = []
    for n in range(2, 11):
        h = " + ".join(
            f"((th{j} * {GOPHER_W_POW[j]}) % {GOPHER_HASH_M})" for j in range(n)
        )
        glen = " + ".join(f"tl{j}" for j in range(n))
        arms.append(
            f"SELECT id, n_chars, {n} AS n, (({h}) % {GOPHER_HASH_M}) AS h,"
            f" ({glen} + {n - 1}) AS glen FROM __led"
        )
    unpivot = "\n  UNION ALL\n  ".join(arms)
    t_aggs = ",\n       ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN top_chars END), 0) AS t{n}"
        for n in GOPHER_TOP_THR
    )
    d_aggs = ",\n       ".join(
        f"coalesce(max(CASE WHEN n = {n} THEN dup_chars END), 0) AS d{n}"
        for n in GOPHER_DUP_THR
    )
    t_micro = ",\n       ".join(
        f"((coalesce(t{n}, 0) * 1000000) // nc)::BIGINT AS top{n}_micro"
        for n in GOPHER_TOP_THR
    )
    d_micro = ",\n       ".join(
        f"((coalesce(d{n}, 0) * 1000000) // nc)::BIGINT AS dup{n}_micro"
        for n in GOPHER_DUP_THR
    )
    keep_terms = " AND ".join(
        [
            f"coalesce(t{n}, 0) * 100 <= {thr} * nc"
            for n, thr in GOPHER_TOP_THR.items()
        ]
        + [
            f"coalesce(d{n}, 0) * 100 <= {thr} * nc"
            for n, thr in GOPHER_DUP_THR.items()
        ]
    )
    toks = f"list_filter(string_split_regex({text_col}, '{_TSR}'), x -> x <> '')"
    return f"""
WITH __tok AS (
  SELECT id, n_chars, pos,
         (('0x' || substring(md5(tok), 1, 15))::BIGINT % {GOPHER_HASH_M}) AS th,
         length(tok)::BIGINT AS tl
  FROM (
    SELECT id, n_chars,
           unnest(toks) AS tok,
           unnest(range(1, len(toks) + 1)) AS pos
    FROM (SELECT {id_col} AS id,
                 greatest(length({text_col}), 1)::BIGINT AS n_chars,
                 {toks} AS toks FROM {table})
  )
),
__led AS (
  SELECT id, n_chars,
         {lead_cols}
  FROM __tok
  WINDOW w AS (PARTITION BY id ORDER BY pos)
),
__g AS (
  {unpivot}
),
__c AS (
  SELECT id, n_chars, n, glen, h, count(*)::BIGINT AS c
  FROM __g WHERE glen IS NOT NULL GROUP BY id, n_chars, n, glen, h
),
__r AS (
  SELECT id, n_chars, n, c, glen,
         row_number() OVER (PARTITION BY id, n
                            ORDER BY c DESC, glen DESC, h DESC) AS rn
  FROM __c
),
__pn AS (
  SELECT id, n, max(n_chars) AS n_chars,
         max(CASE WHEN rn = 1 THEN c * glen END) AS top_chars,
         coalesce(sum(CASE WHEN c > 1 THEN c * glen END), 0) AS dup_chars
  FROM __r GROUP BY id, n
),
__col AS (
  SELECT id, max(n_chars) AS gnc,
       {t_aggs},
       {d_aggs}
  FROM __pn GROUP BY id
),
__j AS (
  SELECT s.id, coalesce(c.gnc, s.n_chars) AS nc,
         c.* EXCLUDE (id, gnc)
  FROM (SELECT {id_col} AS id, greatest(length({text_col}), 1)::BIGINT AS n_chars
        FROM {table}) s
  LEFT JOIN __col c ON s.id = c.id
)
SELECT id AS {id_col},
       {t_micro},
       {d_micro},
       ({keep_terms}) AS keep
FROM __j"""


def gopher_keep(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The full Gopher §A1.1 keep decision: rule battery AND repetition
    battery (Rae et al. 2021 apply both before training).

    Output: ``id_col, keep_rules, keep_repetition, keep``.

    Shape: the two batteries scan the text independently (the rule battery
    is a pure zero-shuffle projection; the repetition battery carries its
    one count shuffle) and meet in a single equi-join on the id — at
    100 TB that is two source scans, which beats entangling the
    projection-only battery into the repetition battery's shuffle (the
    join key is the high-entropy doc id; AQE picks the strategy)."""
    flags = gopher_quality_flags(df, id_col, text_col).select(
        id_col, F.col("keep").alias("keep_rules")
    )
    rep = gopher_repetition_stats(df, id_col, text_col).select(
        id_col, F.col("keep").alias("keep_repetition")
    )
    return flags.join(rep, id_col).select(
        id_col,
        "keep_rules",
        "keep_repetition",
        (F.col("keep_rules") & F.col("keep_repetition")).alias("keep"),
    )


def gopher_keep_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`gopher_keep`."""
    return f"""
SELECT f.{id_col},
       f.keep AS keep_rules,
       r.keep AS keep_repetition,
       (f.keep AND r.keep) AS keep
FROM ({gopher_quality_flags_sql(table, id_col, text_col)}) f
JOIN ({gopher_repetition_stats_sql(table, id_col, text_col)}) r
  USING ({id_col})"""
