"""Canonical schemas for the literature-record data model.

The reference builds a dynamically-schema'd pandas table (union of whatever
tags appeared in the file, ``src/parsers/pubmed_parser.py:103``); the rebuilt
engine fixes the schema up-front (SURVEY.md §1.2): scalars are strings,
multi-valued tags are ``array<string>`` (reference keeps Python lists,
``pubmed_parser.py:32,69-81``), and presentation-time flattening
(``parsers_manager.py:198-230``) happens only at the sink.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

_S = StringType()
_A = ArrayType(StringType())

# Superset of the three parsers' standardized columns
# (pubmed_parser.py:154-157, wos_parser.py:215-218,
#  sciencedirect_parser.py:266-269) plus per-source extras from the rename
# maps (pubmed_parser.py:118-145, wos_parser.py:160-212).
RECORD_FIELDS: list[StructField] = [
    StructField("record_id", LongType(), False),
    StructField("source_type", _S, False),
    StructField("title", _S, True),
    StructField("abstract", _S, True),
    StructField("authors", _A, True),
    StructField("full_authors", _A, True),
    StructField("journal", _S, True),
    StructField("journal_full", _S, True),
    StructField("doi", _S, True),
    StructField("pmid", _S, True),
    StructField("wos_id", _S, True),
    StructField("url", _S, True),
    StructField("publication_date", _S, True),
    StructField("publication_year", _S, True),
    StructField("keywords", _A, True),
    StructField("keywords_plus", _A, True),
    StructField("mesh_terms", _A, True),
    StructField("affiliation", _A, True),
    StructField("issn", _A, True),
    StructField("volume", _S, True),
    StructField("issue", _S, True),
    StructField("pages", _S, True),
    StructField("language", _S, True),
    StructField("publication_type", _S, True),
    StructField("times_cited", _S, True),
    StructField("entry_date", _S, True),
    StructField("creation_date", _S, True),
    StructField("medline_date", _S, True),
    StructField("source", _S, True),
    StructField("copyright_info", _S, True),
    StructField("publication_history", _A, True),
]

RECORD_SCHEMA = StructType(RECORD_FIELDS)

RECORD_COLUMNS = [f.name for f in RECORD_FIELDS]

ARRAY_COLUMNS = [f.name for f in RECORD_FIELDS if isinstance(f.dataType, ArrayType)]

# Columns the reference guarantees per source (created as None if absent).
PUBMED_STANDARD = [
    "pmid", "title", "abstract", "publication_date", "authors", "journal",
    "doi", "keywords", "mesh_terms",
]  # pubmed_parser.py:154-157
WOS_STANDARD = [
    "title", "abstract", "publication_date", "authors", "journal", "doi",
    "wos_id", "keywords", "affiliation",
]  # wos_parser.py:215-218
SD_STANDARD = [
    "title", "abstract", "authors", "journal", "doi", "keywords",
    "publication_date",
]  # sciencedirect_parser.py:266-269

# journal-metrics enrichment lookup (FIXTURES.md §2; journal_metrics.py:96-194)
METRICS_SCHEMA = StructType(
    [
        StructField("journal_norm", _S, False),
        StructField("impact_factor", _S, True),
        StructField("sci", _S, True),
        StructField("CAS_Zone", _S, True),
    ]
)

# Source priority used by the dedup operator (main.py:113-114).
SOURCE_PRIORITY = {"wos": 3, "pubmed": 2, "sciencedirect": 1}
