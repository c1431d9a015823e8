"""Golden structural parity of the Excel sink with the reference's
workbook rules (``excel_formatter.py:83-154`` sheet/column layout,
``main.py:280-306`` title-link priority as resolved by SURVEY §2.1 K2).

One tiny corpus — every source type plus every title-link priority case —
renders through the real sink to real .xlsx bytes, and the test asserts
the STRUCTURE cell-by-cell: sheet names and order, per-sheet column
subsets (the reference's intersect-with-existing rule, P7), per-sheet
row filtering by source_type, and the hyperlink target of every title
cell (wos > pubmed > sciencedirect > doi, empty counts as missing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scholarmind_spark.functions.links import with_link_columns
from scholarmind_spark.sinks.excel import write_excel
from scholarmind_spark.xlsxlite import read_xlsx, read_xlsx_hyperlinks

# one row per priority case; doi present everywhere so the fallback is live
CORPUS = [
    # (title, source_type, pmid, wos_id, url, doi)
    ("W both", "wos", "", "WOS:000001", "", "10.1/w"),   # wos beats doi
    ("P both", "pubmed", "111", "", "", "10.1/p"),        # pubmed beats doi
    ("S both", "sciencedirect", "", "", "https://sd/x", "10.1/s"),
    ("P doi-only", "pubmed", "", "", "", "10.1/q"),       # falls to doi_link
    ("W none", "wos", "", "", "", ""),                    # no link at all
]
SCHEMA = (
    "title string, source_type string, pmid string, wos_id string, "
    "url string, doi string"
)


def _corpus(spark):
    return with_link_columns(
        spark.createDataFrame(CORPUS, SCHEMA).withColumn("journal", F.lit("j"))
    )


def test_workbook_structure_matches_reference_rules(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "golden.xlsx")
    write_excel(df, out)
    book = read_xlsx(out)
    links = read_xlsx_hyperlinks(out)

    # sheet names in the reference's creation order (excel_formatter.py:
    # 85,104,121,139: Results first, then WOS, PubMed, ScienceDirect)
    assert list(book) == ["Results", "WOS", "PubMed", "ScienceDirect"]

    # per-sheet headers: the declared subsets intersected with existing
    # columns (P7) — url only exists here among per-source extras
    common = [
        "title", "journal", "doi", "doi_link", "title_link", "source_type",
    ]
    assert book["Results"][0] == common
    assert book["WOS"][0] == common + ["wos_id"]
    assert book["PubMed"][0] == common + ["pmid"]
    assert book["ScienceDirect"][0] == common + ["url"]

    # row filtering: Results has all rows; each source sheet only its own
    def titles(sheet):
        return sorted(r[0] for r in book[sheet][1:])

    assert titles("Results") == sorted(t for t, *_ in CORPUS)
    assert titles("WOS") == ["W both", "W none"]
    assert titles("PubMed") == ["P both", "P doi-only"]
    assert titles("ScienceDirect") == ["S both"]


def test_title_link_priority_golden(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "golden.xlsx")
    write_excel(df, out)
    book = read_xlsx(out)
    links = read_xlsx_hyperlinks(out)

    # expected title hyperlink per row (main.py:280-306 priority):
    expected = {
        "W both": "https://www.webofscience.com/wos/woscc/full-record/WOS:000001",
        "P both": "https://pubmed.ncbi.nlm.nih.gov/111/",
        "S both": "https://sd/x",
        "P doi-only": "https://doi.org/10.1/q",
        "W none": None,  # nothing to link
    }
    rows = book["Results"]
    header = rows[0]
    t_idx = header.index("title")
    assert t_idx == 0
    got = {}
    for ri, row in enumerate(rows[1:], start=2):  # excel rows are 1-based
        got[row[t_idx]] = links["Results"].get(f"A{ri}")
    assert got == expected

    # doi_link cells self-link when non-empty (excel_formatter.py:313-319)
    d_idx = header.index("doi_link")
    col = chr(ord("A") + d_idx)
    for ri, row in enumerate(rows[1:], start=2):
        cell = links["Results"].get(f"{col}{ri}")
        want = row[d_idx] if row[d_idx] else None
        assert cell == want, (row[0], cell, want)


def test_sink_does_not_rederive_title_link_pubmed_first(spark, tmp_path):
    """The reference computes title_link twice with CONTRADICTORY priority:
    main.py:280-306 (wos > pubmed > sciencedirect > doi) when building the
    column, then excel_formatter.py:326-338 re-derives the hyperlink at
    render time with PUBMED first (pubmed > wos > sciencedirect > doi),
    silently overriding main.py whenever both links coexist.  The rebuild
    resolves the inconsistency to main.py semantics: title_link is computed
    ONCE upstream (functions/links.py with_link_columns) and the sink
    consumes it verbatim — no second derivation.

    The divergence is only observable on a row carrying BOTH wos_link and
    pubmed_link (impossible through the per-source builders, which is why
    the reference bug stayed latent): a re-deriving sink would emit the
    PubMed URL, the faithful sink emits title_link's WOS URL."""
    row = {
        "title": "Both links",
        "journal": "j",
        "source_type": "wos",
        "doi": "10.1/b",
        "doi_link": "https://doi.org/10.1/b",
        "pubmed_link": "https://pubmed.ncbi.nlm.nih.gov/999/",
        "wos_link": "https://www.webofscience.com/wos/woscc/full-record/WOS:9",
        "sciencedirect_link": "",
        # upstream main.py-priority resolution: wos wins
        "title_link": "https://www.webofscience.com/wos/woscc/full-record/WOS:9",
        "wos_id": "WOS:9",
    }
    df = spark.createDataFrame([tuple(row.values())], list(row.keys()))
    out = str(tmp_path / "divergence.xlsx")
    write_excel(df, out)
    links = read_xlsx_hyperlinks(out)
    # title cell (A2) carries the upstream WOS link, NOT the PubMed link an
    # excel_formatter.py:326-338-style render pass would have substituted
    assert links["Results"].get("A2") == row["wos_link"]

    # and the upstream chain itself is wos-first when both are non-empty
    from scholarmind_spark.functions.links import first_non_empty

    got = (
        spark.range(1)
        .select(
            first_non_empty(
                F.lit(row["wos_link"]), F.lit(row["pubmed_link"])
            ).alias("tl")
        )
        .collect()[0]
        .tl
    )
    assert got == row["wos_link"]


def test_header_fill_and_column_widths_match_reference(spark, tmp_path):
    """Styling parity: header fill 366092 (excel_formatter.py:215-216) and
    the per-column width mapping with default 20 (excel_formatter.py:
    227-260) — title=60, journal=25, source_type=15, doi=15, links=25."""
    import zipfile

    df = _corpus(spark)
    out = str(tmp_path / "style.xlsx")
    write_excel(df, out)
    with zipfile.ZipFile(out) as z:
        styles = z.read("xl/styles.xml").decode()
        sheet1 = z.read("xl/worksheets/sheet1.xml").decode()
    assert "FF366092" in styles and "FF4472C4" not in styles
    # Results sheet columns: title, journal, doi, doi_link, title_link,
    # source_type → widths 60, 25, 15, 25, 20 (default), 15
    for col_idx, width in [(1, 60), (2, 25), (3, 15), (4, 25), (5, 20), (6, 15)]:
        assert f'min="{col_idx}" max="{col_idx}" width="{width}"' in sheet1, (
            col_idx,
            width,
            sheet1[:800],
        )
