"""Excel sink styling/hyperlink semantics (K1/K2,
excel_formatter.py:280-345).  The sink writes a REAL .xlsx through the
vendored stdlib writer, so the workbook-assembly test round-trips an
actual file via :func:`xlsxlite.read_xlsx` and inspects the hyperlink
relationships in the zip parts directly."""

from __future__ import annotations

import zipfile

from scholarmind_spark.sinks.excel import content_row_height, hyperlink_targets
from scholarmind_spark.xlsxlite import read_xlsx


def test_content_row_height():
    # no non-empty strings → no CUSTOM height at all: the reference only
    # sets one when row_height > 0 (excel_formatter.py:289), keeping
    # Excel's default row height for purely numeric/empty rows
    assert content_row_height([None, 5, ""]) is None
    # short string → base 15, clamped up to 20
    assert content_row_height(["short"]) == 20
    # 250 chars → 15 + 2*15 = 45
    assert content_row_height(["x" * 250]) == 45
    # very long → capped at 15 + 100 = 115
    assert content_row_height(["x" * 5000]) == 115
    # longest cell wins: 999 chars → 15 + min(9*15, 100) = 115
    assert content_row_height(["x" * 250, "x" * 999]) == 115


def test_hyperlink_targets():
    cols = ["title", "doi_link", "abstract", "title_link"]
    vals = ["A title", "https://doi.org/10.1/x", "text", "https://pubmed.gov/1"]
    t = hyperlink_targets(cols, vals)
    # title → title_link (priority resolved upstream); doi_link → itself
    assert t == {0: "https://pubmed.gov/1", 1: "https://doi.org/10.1/x"}
    # empty link values produce no hyperlink
    assert hyperlink_targets(cols, ["T", "", "x", ""]) == {}
    # no title_link column → title not linked
    assert hyperlink_targets(["title"], ["T"]) == {}


def test_write_excel_workbook_assembly(spark, tmp_path):
    from scholarmind_spark.sinks.excel import write_excel

    df = spark.createDataFrame(
        [
            ("Paper A", "https://pubmed.gov/1", "https://doi.org/10.1/a",
             "pubmed", "abstract " * 50),
            ("Paper B", "", "", "wos", "short"),
        ],
        "title string, title_link string, doi_link string, "
        "source_type string, abstract string",
    )
    out = str(tmp_path / "wb.xlsx")
    write_excel(df, out)

    sheets = read_xlsx(out)
    assert list(sheets) == ["Results", "WOS", "PubMed", "ScienceDirect"]

    results = sheets["Results"]
    cols = results[0]
    title_i = cols.index("title")
    rows = {r[title_i]: r for r in results[1:]}
    assert set(rows) == {"Paper A", "Paper B"}
    assert rows["Paper A"][cols.index("doi_link")] == "https://doi.org/10.1/a"

    # per-source sheet filtered by source_type (P6)
    pubmed = sheets["PubMed"]
    assert len(pubmed) == 2 and pubmed[1][pubmed[0].index("title")] == "Paper A"
    assert len(sheets["ScienceDirect"]) == 1  # header only, no SD rows

    with zipfile.ZipFile(out) as zf:
        # sheet 1 = Results: title cell of Paper A links to its title_link,
        # doi_link links to itself (K2) — both as external relationships
        rels = zf.read("xl/worksheets/_rels/sheet1.xml.rels").decode()
        assert "https://pubmed.gov/1" in rels
        assert "https://doi.org/10.1/a" in rels
        sheet1 = zf.read("xl/worksheets/sheet1.xml").decode()
        assert "<hyperlink " in sheet1
        assert 'state="frozen"' in sheet1  # frozen header pane (K1)
        # content-scaled row heights: the 50×"abstract " row is tall,
        # the short row clamps to the 20 minimum
        assert 'customHeight="1"' in sheet1
        # link font color in the style part (excel_formatter.py:319)
        assert "0563C1" in zf.read("xl/styles.xml").decode()
        # Paper B has empty links → no hyperlink part for a sheet with
        # no linked cells (WOS sheet row has none)
        wos_sheet = zf.read("xl/worksheets/sheet2.xml").decode()
        assert "<hyperlink " not in wos_sheet


def test_write_excel_deterministic(spark, tmp_path):
    from scholarmind_spark.sinks.excel import write_excel

    df = spark.createDataFrame(
        [("T", "pubmed", "a")], "title string, source_type string, abstract string"
    )
    a, b = str(tmp_path / "a.xlsx"), str(tmp_path / "b.xlsx")
    write_excel(df, a)
    write_excel(df, b)
    assert open(a, "rb").read() == open(b, "rb").read()
