"""Deduplication operators.

``priority_dedup`` is the reference's marquee operator (A1,
``main.py:59-166``): dedup by normalized DOI keeping the highest-priority
source (wos=3 > pubmed=2 > sciencedirect=1, ``main.py:112-115``); rows with
null/empty DOI are never considered duplicates (``main.py:104-151``).

The reference's first-seen-wins scan over a pandas sort is
order/implementation-defined on ties (``main.py:115,117`` — quicksort is not
stable).  The rebuild makes the tiebreak total and documented: within equal
``(doi_norm, source_priority)`` the row with the smallest ``tiebreak``
column (default ``record_id``) wins.

Scale design (100 TB): one shuffle on ``doi_norm``.  Null/empty keys would
form one giant skewed partition if fed to the window naively; instead each
empty-key row gets a unique synthetic key so it forms its own single-row
window partition — one scan, no skew, no second pass / union.

``dedup_exact`` is the training-data-pipeline exact dedup: hash-groupBy on a
canonical content key, deterministic survivor (min id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scholarmind_spark.functions.doi import doi_norm
from scholarmind_spark.schemas import SOURCE_PRIORITY


def source_priority(source_type: Column) -> Column:
    """wos=3, pubmed=2, sciencedirect=1, else 0 (main.py:112-114)."""
    expr = F.lit(0)
    for name, prio in SOURCE_PRIORITY.items():
        expr = F.when(source_type == name, F.lit(prio)).otherwise(expr)
    return expr


def title_norm(title: Column) -> Column:
    """Conservative title key: lower, collapse whitespace runs, trim —
    the D11 journal-key normalization style applied to titles.  No
    punctuation stripping: the fuzzy pass's edit-distance tolerance
    absorbs small punctuation/typo deltas, and stripping would silently
    merge genuinely distinct titles ('Part I.' vs 'Part II.')."""
    return F.trim(F.regexp_replace(F.lower(title), "\\s+", " "))


def priority_dedup(
    df: DataFrame,
    key: Column | None = None,
    priority: Column | None = None,
    tiebreak: str = "record_id",
    keep_key: bool = False,
    fuzzy_nodoi: bool = False,
    title_col: str = "title",
    fuzzy_max_dist: int = 2,
) -> DataFrame:
    """Reference A1 as a single window pass.

    Parameters mirror the generalized operator: ``key`` defaults to
    ``doi_norm(doi)``, ``priority`` to the reference source ranking.

    ``fuzzy_nodoi=True`` adds the second pass the reference lacks
    (``main.py:104-151`` never dedups null/empty-DOI records — the #1 gap
    a real bibliometrics user hits, since preprints and ScienceDirect
    citations often carry no DOI): empty-key survivors of the first pass
    are near-dup'd on the normalized ``title_col`` within
    ``fuzzy_max_dist`` edits (:func:`fuzzy_title_dedup`), same
    source-priority survivor rule, same tiebreak."""
    key = doi_norm(F.col("doi")) if key is None else key
    priority = source_priority(F.col("source_type")) if priority is None else priority

    key_is_empty = key.isNull() | (key == "")
    # Unique synthetic key per empty-key row: single-row window partitions
    # instead of one skewed null partition.  \x00 prefix cannot collide with
    # a real normalized DOI (lower/trim never emits NUL).
    eff_key = F.when(
        key_is_empty, F.concat(F.lit("\x00"), F.col(tiebreak).cast("string"))
    ).otherwise(key)

    w = Window.partitionBy("__dedup_key").orderBy(
        F.desc("__dedup_prio"), F.asc(tiebreak)
    )
    out = (
        df.withColumn("__dedup_key", eff_key)
        .withColumn("__dedup_prio", priority)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    drop = ["__dedup_prio", "__rn"] + ([] if keep_key else ["__dedup_key"])
    if keep_key:
        out = out.withColumn(
            "doi_norm",
            F.when(F.col("__dedup_key").startswith("\x00"), F.lit("")).otherwise(
                F.col("__dedup_key")
            ),
        )
        drop.append("__dedup_key")
    out = out.drop(*drop)
    if fuzzy_nodoi:
        out = fuzzy_title_dedup(
            out,
            title_col=title_col,
            priority=priority,
            tiebreak=tiebreak,
            max_dist=fuzzy_max_dist,
            subset=key_is_empty,
        )
    return out


def fuzzy_title_dedup(
    df: DataFrame,
    title_col: str = "title",
    priority: Column | None = None,
    tiebreak: str = "record_id",
    max_dist: int = 2,
    subset: Column | None = None,
) -> DataFrame:
    """Drop every row (within ``subset``) that has a strictly-better
    near-duplicate title; all other rows pass through untouched.

    Semantics (single-pass DOMINANCE, not connected components): row *r*
    is dropped iff some other eligible row *s* exists with

        title_key(s) == title_key(r)  OR  lev(title_key(s), title_key(r)) <= max_dist

    and ``(prio_s, -tiebreak_s) > (prio_r, -tiebreak_r)``.  For the real
    duplicate shape (the same paper from 2-3 sources — every pair inside
    the cluster matches) this equals the CC-survivor rule; on threshold-
    boundary CHAINS (a~b, b~c, a!~c) dominance deliberately keeps both
    undominated endpoints instead of transitively merging records that
    never matched each other — and it stays one declarative join, no
    iterative fixpoint.  Null/empty title keys are exempt (cannot match
    anything), mirroring the DOI pass's null exemption.

    Scale: candidate pairs come from the lossless PassJoin segment
    blocking in :func:`~scholarmind_spark.operators.linkage.fuzzy_link`
    (never all-pairs); the dominance join shuffles on the high-cardinality
    title key.  One aggregation-free anti-join closes it out.
    """
    from scholarmind_spark.operators.linkage import fuzzy_link

    priority = source_priority(F.col("source_type")) if priority is None else priority
    in_subset = F.lit(True) if subset is None else subset

    elig = (
        df.withColumn("__tk", title_norm(F.col(title_col)))
        .withColumn("__fprio", priority)
        .filter(in_subset & F.col("__tk").isNotNull() & (F.col("__tk") != ""))
        .select(F.col(tiebreak).alias("__fid"), "__tk", "__fprio")
    )
    pairs = fuzzy_link(elig, "__tk", max_dist=max_dist)
    # both orientations of each fuzzy value-pair + the identity edge per
    # distinct key (exact-equal titles are pairs fuzzy_link excludes)
    edges = (
        pairs.select(F.col("a").alias("__ka"), F.col("b").alias("__kb"))
        .unionByName(pairs.select(F.col("b").alias("__ka"), F.col("a").alias("__kb")))
        .unionByName(
            elig.select(F.col("__tk").alias("__ka"))
            .distinct()
            .select("__ka", F.col("__ka").alias("__kb"))
        )
    )
    loser = elig
    winner = elig.select(
        F.col("__fid").alias("__wid"),
        F.col("__tk").alias("__wtk"),
        F.col("__fprio").alias("__wprio"),
    )
    dominated = (
        loser.join(edges, loser["__tk"] == F.col("__ka"))
        .join(winner, F.col("__kb") == F.col("__wtk"))
        .filter(
            (F.col("__wprio") > F.col("__fprio"))
            | (
                (F.col("__wprio") == F.col("__fprio"))
                & (F.col("__wid") < F.col("__fid"))
            )
        )
        .select(F.col("__fid").alias(tiebreak))
        .distinct()
    )
    return df.join(dominated, on=tiebreak, how="left_anti")


def dedup_exact(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact-content dedup: group by a canonical content hash, keep the row
    with the minimum id.  Hash-groupBy = one shuffle on the (high-entropy,
    skew-free) digest; survivor choice is a max_by/min_by single agg, not a
    window, so map-side partial aggregation applies."""
    content = F.col(content_col)
    if normalize:
        from scholarmind_spark.operators.textstats import TOKEN_SPLIT_RE

        content = F.lower(F.trim(F.regexp_replace(content, TOKEN_SPLIT_RE, " ")))
    digest = F.md5(content)
    keep_ids = (
        df.select(digest.alias("__h"), F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .drop("__h")
    )
    # keep_ids is |distinct| rows of one long column — broadcastable at
    # moderate scale; at 100 TB Spark picks SMJ on the sorted id, also fine.
    return df.join(keep_ids, on=id_col, how="left_semi")
