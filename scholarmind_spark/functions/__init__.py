from scholarmind_spark.functions.doi import doi_link, doi_norm, doi_norm_sql
from scholarmind_spark.functions.links import (
    first_non_empty,
    pubmed_link,
    sciencedirect_link,
    with_link_columns,
    wos_link,
)
from scholarmind_spark.functions.text import (
    coalesce_journal,
    extract_year,
    join_authors,
    journal_norm,
    normalize_keywords_sep,
    split_sd_authors,
    with_publication_year,
)

__all__ = [
    "doi_link",
    "doi_norm",
    "doi_norm_sql",
    "first_non_empty",
    "pubmed_link",
    "sciencedirect_link",
    "with_link_columns",
    "wos_link",
    "coalesce_journal",
    "extract_year",
    "join_authors",
    "journal_norm",
    "normalize_keywords_sep",
    "split_sd_authors",
    "with_publication_year",
]
