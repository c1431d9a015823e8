"""Duplicate-span detection — the ExactSubstr pass of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better"): find the
regions of each document that are duplicated ELSEWHERE in the corpus
(any other document, or another place in the same one) and report them
as maximal spans, so the caller can cut the span, not the document —
the paper's key finding is that substring-level removal beats
document-level dedup on memorization.

The paper builds a corpus-wide suffix array (single machine, bytes).
The Spark-first equivalent anchors on fixed-width token shingles:

- every position p of every document emits its k-token shingle hash —
  a pure projection (posexplode), no state;
- ONE corpus-wide groupBy counts each shingle's occurrences (map-side
  partial aggregation → the shuffle carries distinct shingles, not
  positions); a shingle with count ≥ 2 is duplicated somewhere — the
  within-document repeat is counted exactly like the cross-document
  one, matching the suffix-array semantics;
- positions whose shingle is duplicated come back via one hash-keyed
  join, and per document the covered intervals [p, p+k-1] are merged
  into maximal spans by the classic ordered cumulative-max device (two
  window functions over per-doc position order — doc-local, so the
  window partitions by doc and never globally sorts).

Granularity honesty (the deliberate divergences from the paper, stated
rather than hidden):

- TOKEN granularity, not bytes: a duplicated region shorter than k
  tokens is invisible, and span edges snap to token boundaries.  k
  plays the role of the paper's minimum match length (they use 50
  bytes; 5-10 tokens is the comparable regime).
- A merged span guarantees every position inside it sits in SOME
  ≥k-token duplicated substring; the span as a whole need not be one
  contiguous duplicate of a single other location (two overlapping
  runs duplicated against different sources merge — exactly what a
  scrub pass wants, since every part is duplicated somewhere, but a
  provenance pass would need the per-shingle matches instead).

Scale shape: shuffle volume is (positions) for the join and (distinct
shingles) for the count — both linear in corpus tokens; the span merge
is doc-partitioned windows.  Nothing is all-pairs, nothing collects.

Reference parity note: the upstream reference (ScholarMind) has no
substring-level dedup — this extends the engine for LLM-training-data
curation alongside the document-level families in ``neardup.py`` and
the ≥N-doc boilerplate hotlist in ``boilerplate.py`` (which requires a
span to recur across min_docs DOCUMENTS; this operator fires on the
SECOND occurrence anywhere, the Lee et al. threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scholarmind_spark.operators.neardup import minhash_base
from scholarmind_spark.operators.textstats import tokens, tokens_sql


def _pos_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, pos, sh) — 0-based token position and the 60-bit hash of the
    k-token shingle starting there (lowercased, single-space joined)."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)

    # guard: sequence(1, 0) steps DOWNWARD in Spark — short docs must
    # yield an empty shingle array, not a phantom one.  The token array
    # is LET-BOUND (single-element transform) before the per-position
    # lambda: an interpreted lambda closing over the raw split+lower
    # expression re-evaluates it per position (measured 5.5 s → 1.2 s
    # for this projection at sf0.1 — see neardup.shingles).
    def grams(tk: Column) -> Column:
        return F.when(
            F.size(tk) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(tk, i, k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    sh = F.element_at(F.transform(F.array(toks), grams), 1)
    return (
        df.select(F.col(id_col).alias("id"), F.posexplode(sh).alias("pos", "g"))
        .select("id", "pos", minhash_base(F.col("g")).alias("sh"))
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """``id_col, span_start, span_end, n_words`` — maximal merged token
    spans (0-based, inclusive) covered by k-token shingles occurring
    ``min_count``+ times corpus-wide.  min_count=2 is the Lee et al.
    duplicated-anywhere threshold; raise it to tolerate low-copy
    repetition (quotes, licenses)."""
    from scholarmind_spark.util import attach_caches

    # the positions table feeds BOTH the hot-shingle count and the
    # join-back — persist so the tokenize+hash pass runs once, not twice
    # (caller releases via release_caches; the gate wrappers do)
    ps = _pos_shingles(df, id_col, text_col, k).persist()
    hot = (
        ps.groupBy("sh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("sh")
    )
    dup = ps.join(hot, "sh", "left_semi").select(
        "id", "pos", (F.col("pos") + F.lit(k - 1)).alias("end")
    )
    # maximal-interval merge: ordered by start within each doc, a new
    # span opens where start exceeds the running max end + 1 (abutting
    # intervals merge: [0,4] + [5,9] is one contiguous duplicated region)
    w = Window.partitionBy("id").orderBy("pos")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    marked = dup.withColumn(
        "new_span",
        F.when(
            F.col("pos") > F.coalesce(F.max("end").over(wprev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("span_id", F.sum("new_span").over(w))
    out = (
        marked.groupBy("id", "span_id")
        .agg(F.min("pos").alias("span_start"), F.max("end").alias("span_end"))
        .select(
            F.col("id").alias(id_col),
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("n_words"),
        )
    )
    return attach_caches(out, [ps])


def _pos_shingles_sql(table: str, id_col: str, text_col: str, k: int) -> str:
    toks = f"list_transform({tokens_sql(text_col)}, w -> lower(w))"
    idx = f"range(1, greatest(len({toks}) - {k - 1}, 0) + 1)"
    gram = f"array_to_string(list_slice({toks}, i, i + {k - 1}), ' ')"
    h = "(('0x' || substring(md5(g), 1, 15))::BIGINT)"
    return f"""
(SELECT id, pos, {h} AS sh FROM (
   SELECT {id_col} AS id, i - 1 AS pos, {gram} AS g
   FROM (SELECT {id_col}, {text_col}, unnest({idx}) AS i FROM {table}) t
 ))"""


def duplicate_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`duplicate_spans` (same shingle hash, same
    interval-merge windows)."""
    ps = _pos_shingles_sql(table, id_col, text_col, k)
    return f"""
(WITH ps AS MATERIALIZED {ps},
 hot AS (SELECT sh FROM ps GROUP BY sh HAVING count(*) >= {min_count}),
 dup AS (
   SELECT id, pos, pos + {k - 1} AS "end"
   FROM ps SEMI JOIN hot USING (sh)
 ),
 marked AS (
   SELECT id, pos, "end",
          CASE WHEN pos > coalesce(max("end") OVER (
                 PARTITION BY id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
               THEN 1 ELSE 0 END AS new_span
   FROM dup
 ),
 spans AS (
   SELECT id, pos, "end",
          sum(new_span) OVER (
            PARTITION BY id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
   FROM marked
 )
 SELECT id AS {id_col},
        min(pos)::INT AS span_start,
        max("end")::INT AS span_end,
        (max("end") - min(pos) + 1)::INT AS n_words
 FROM spans GROUP BY id, span_id)"""


def scrub_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Rebuild each document with every duplicated span CUT — the
    removal pass of Lee et al.'s ExactSubstr tool (their released
    deduplicator cuts every occurrence of a duplicated substring; they
    note models see the content once via the surviving shorter copies
    below the k threshold).  Keeps every row (a fully-duplicated doc
    becomes empty text, it does not disappear — dropping rows is a
    policy for the caller), preserves surviving token order, single-
    space rejoins.

    One posexplode + one range join... deliberately NOT: the span table
    is doc-keyed and tiny relative to tokens, so tokens join spans ON
    THE DOC ID (equi-join) and the in-span test is a post-join filter —
    no interval-join machinery needed because spans within a doc are
    disjoint by construction (maximal merge).
    """
    from scholarmind_spark.util import attach_caches

    span_df = duplicate_spans(df, id_col, text_col, k, min_count)
    spans = span_df.select(
        F.col(id_col).alias("id"),
        F.struct("span_start", "span_end").alias("sp"),
    )
    per_doc = spans.groupBy("id").agg(F.collect_list("sp").alias("sps"))
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    joined = df.select(F.col(id_col).alias("id"), toks.alias("__t")).join(
        per_doc, "id", "left"
    )
    keep = F.filter(
        F.transform(
            F.col("__t"),
            lambda w, i: F.struct(w.alias("w"), i.alias("i")),
        ),
        lambda s: ~F.exists(
            F.coalesce(
                F.col("sps"),
                F.array().cast("array<struct<span_start:int,span_end:int>>"),
            ),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] <= sp["span_end"]),
        ),
    )
    out = joined.select(
        F.col("id").alias(id_col),
        F.array_join(F.transform(keep, lambda s: s["w"]), " ").alias(text_col),
    )
    return attach_caches(out, list(getattr(span_df, "_sm_caches", ())))


def scrub_duplicate_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`scrub_duplicate_spans`."""
    spans = duplicate_spans_sql(table, id_col, text_col, k, min_count)
    toks = f"list_transform({tokens_sql(text_col)}, w -> lower(w))"
    return f"""
(WITH sp AS (
   SELECT {id_col} AS id,
          list(struct_pack(s := span_start, e := span_end)) AS sps
   FROM {spans} GROUP BY {id_col}
 ),
 tk AS (SELECT {id_col} AS id, {toks} AS t FROM {table})
 SELECT tk.id AS {id_col},
        -- coalesce: DuckDB's array_to_string([]) is NULL where Spark's
        -- array_join([]) is '' (the fully-scrubbed-doc case)
        coalesce(array_to_string(
          list_transform(
            list_filter(
              list_transform(t, (w, i) -> struct_pack(w := w, i := i - 1)),
              -- nested list_filter instead of EXISTS: DuckDB rejects
              -- subqueries inside lambda bodies
              s -> len(list_filter(
                     coalesce(sps, []),
                     x -> s.i >= x.s AND s.i <= x.e)) = 0
            ),
            s -> s.w
          ), ' '), '') AS {text_col}
 FROM tk LEFT JOIN sp ON tk.id = sp.id)"""


def contamination_spans(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """``id_col, span_start, span_end, n_words`` — maximal corpus spans
    covered by k-token shingles that appear ANYWHERE in ``benchmark`` —
    span-level eval-set decontamination (the GPT-3/PaLM appendix recipe:
    n-gram collision against the benchmark, cut the span, keep the doc;
    the doc-level twin is ``operators/decontam.decontamination_overlap``,
    which flags whole documents by overlap fraction).

    One distinct-shingle projection of the benchmark (its size bounds
    the hot set — eval sets are tiny next to the corpus, so the semi-
    join's build side is benchmark-bounded), then exactly the
    :func:`duplicate_spans` join + doc-local interval merge on the
    corpus side.  A span here means "every position in it sits in some
    ≥k-token benchmark collision" — the scrub-oriented guarantee.

    Compose with :func:`scrub_duplicate_spans`' reassembly by feeding
    these spans in place of the duplicate ones, or drop the rows whose
    span coverage exceeds a policy threshold.
    """
    from scholarmind_spark.util import attach_caches

    ps = _pos_shingles(df, id_col, text_col, k).persist()
    hot = (
        _pos_shingles(benchmark, bench_id_col, bench_text_col, k)
        .select("sh")
        .distinct()
    )
    dup = ps.join(hot, "sh", "left_semi").select(
        "id", "pos", (F.col("pos") + F.lit(k - 1)).alias("end")
    )
    w = Window.partitionBy("id").orderBy("pos")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    marked = dup.withColumn(
        "new_span",
        F.when(
            F.col("pos") > F.coalesce(F.max("end").over(wprev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("span_id", F.sum("new_span").over(w))
    out = (
        marked.groupBy("id", "span_id")
        .agg(F.min("pos").alias("span_start"), F.max("end").alias("span_end"))
        .select(
            F.col("id").alias(id_col),
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("n_words"),
        )
    )
    return attach_caches(out, [ps])


def contamination_spans_sql(
    table: str,
    bench_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    k: int = 5,
) -> str:
    """DuckDB twin of :func:`contamination_spans`."""
    ps = _pos_shingles_sql(table, id_col, text_col, k)
    bs = _pos_shingles_sql(bench_table, bench_id_col, bench_text_col, k)
    return f"""
(WITH ps AS MATERIALIZED {ps},
 hot AS (SELECT DISTINCT sh FROM {bs}),
 dup AS (
   SELECT id, pos, pos + {k - 1} AS "end"
   FROM ps SEMI JOIN hot USING (sh)
 ),
 marked AS (
   SELECT id, pos, "end",
          CASE WHEN pos > coalesce(max("end") OVER (
                 PARTITION BY id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
               THEN 1 ELSE 0 END AS new_span
   FROM dup
 ),
 spans AS (
   SELECT id, pos, "end",
          sum(new_span) OVER (
            PARTITION BY id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
   FROM marked
 )
 SELECT id AS {id_col},
        min(pos)::INT AS span_start,
        max("end")::INT AS span_end,
        (max("end") - min(pos) + 1)::INT AS n_words
 FROM spans GROUP BY id, span_id)"""
