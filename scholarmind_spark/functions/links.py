"""Link-builder expressions (reference D6 / A2, ``main.py:176-306``).

Each link column is gated on ``source_type`` and key non-nullness exactly as
the reference's row loops do; ``title_link`` is the first-non-empty coalesce
chain in the ``main.py:280-306`` priority order (wos > pubmed >
sciencedirect > doi — the rebuild standardizes on this over the conflicting
``excel_formatter.py:326-338`` order, per SURVEY.md §2.1 K2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.functions.doi import doi_link

PUBMED_PREFIX = "https://pubmed.ncbi.nlm.nih.gov/"
WOS_PREFIX = "https://www.webofscience.com/wos/woscc/full-record/"


def pubmed_link(source_type: Column, pmid: Column) -> Column:
    """main.py:176-183."""
    return F.when(
        (source_type == "pubmed") & pmid.isNotNull() & (F.trim(pmid) != ""),
        F.concat(F.lit(PUBMED_PREFIX), F.trim(pmid), F.lit("/")),
    ).otherwise(F.lit(""))


def wos_link(source_type: Column, wos_id: Column) -> Column:
    """main.py:185-192."""
    return F.when(
        (source_type == "wos") & wos_id.isNotNull() & (F.trim(wos_id) != ""),
        F.concat(F.lit(WOS_PREFIX), F.trim(wos_id)),
    ).otherwise(F.lit(""))


def sciencedirect_link(source_type: Column, url: Column) -> Column:
    """main.py:194-197 (SD rows carry their own URL)."""
    return F.when(
        (source_type == "sciencedirect") & url.isNotNull() & (F.trim(url) != ""),
        F.trim(url),
    ).otherwise(F.lit(""))


def first_non_empty(*cols: Column) -> Column:
    """Coalesce chain where empty string counts as missing (reference A2)."""
    out = F.coalesce(*[F.nullif(c, F.lit("")) for c in cols])
    return F.coalesce(out, F.lit(""))


def with_link_columns(df: DataFrame) -> DataFrame:
    """Attach pubmed_link / wos_link / sciencedirect_link / doi_link /
    title_link (reference main.py:169-306, D6+D7+A2)."""
    st = F.col("source_type")
    return df.withColumns(
        {
            "pubmed_link": pubmed_link(st, F.col("pmid")),
            "wos_link": wos_link(st, F.col("wos_id")),
            "sciencedirect_link": sciencedirect_link(st, F.col("url")),
            "doi_link": doi_link(F.col("doi")),
        }
    ).withColumn(
        "title_link",
        first_non_empty(
            F.col("wos_link"),
            F.col("pubmed_link"),
            F.col("sciencedirect_link"),
            F.col("doi_link"),
        ),
    )
