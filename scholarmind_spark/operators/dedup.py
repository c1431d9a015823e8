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


def priority_dedup(
    df: DataFrame,
    key: Column | None = None,
    priority: Column | None = None,
    tiebreak: str = "record_id",
    keep_key: bool = False,
) -> DataFrame:
    """Reference A1 as a single window pass.

    Parameters mirror the generalized operator: ``key`` defaults to
    ``doi_norm(doi)``, ``priority`` to the reference source ranking.
    """
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
    return out.drop(*drop)


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
