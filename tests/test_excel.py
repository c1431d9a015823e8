"""Excel sink styling/hyperlink semantics (K1/K2,
excel_formatter.py:280-345).  openpyxl is absent from the container, so the
cell-level rules are pure helpers tested directly, and the workbook
assembly is exercised against a minimal in-memory openpyxl stand-in."""

from __future__ import annotations

import sys
import types

import pytest

from scholarmind_spark.sinks.excel import content_row_height, hyperlink_targets


def test_content_row_height():
    # no strings → minimum 20 (excel_formatter.py:289-290)
    assert content_row_height([None, 5, ""]) == 20
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


class _Cell:
    def __init__(self):
        self.value = None
        self.font = self.fill = self.alignment = self.hyperlink = None


class _Dim:
    width = None
    height = None


class _WS:
    def __init__(self, title):
        self.title = title
        self.rows = []
        self._cells = {}
        self.column_dimensions = {}
        self.row_dimensions = {}
        self.freeze_panes = None

    def append(self, vals):
        self.rows.append(list(vals))
        r = len(self.rows)
        for i, v in enumerate(vals, 1):
            self.cell(row=r, column=i).value = v

    def cell(self, row, column):
        return self._cells.setdefault((row, column), _Cell())


class _DimMap(dict):
    def __getitem__(self, k):
        return self.setdefault_dim(k)

    def setdefault_dim(self, k):
        if k not in self:
            dict.__setitem__(self, k, _Dim())
        return dict.get(self, k)


class _WB:
    def __init__(self):
        self.active = _WS("default")
        self.sheets = []
        self.saved_to = None

    def remove(self, ws):
        pass

    def create_sheet(self, name):
        ws = _WS(name)
        ws.column_dimensions = _DimMap()
        ws.row_dimensions = _DimMap()
        self.sheets.append(ws)
        return ws

    def save(self, path):
        self.saved_to = path


@pytest.fixture
def fake_openpyxl(monkeypatch):
    built = []

    def workbook():
        wb = _WB()
        built.append(wb)
        return wb

    mod = types.ModuleType("openpyxl")
    mod.Workbook = workbook
    styles = types.ModuleType("openpyxl.styles")

    class _Style:
        def __init__(self, *a, **kw):
            self.args, self.kw = a, kw

    styles.Font = styles.PatternFill = styles.Alignment = _Style
    utils = types.ModuleType("openpyxl.utils")
    utils.get_column_letter = lambda i: chr(64 + i)
    mod.styles, mod.utils = styles, utils
    for name, m in [("openpyxl", mod), ("openpyxl.styles", styles), ("openpyxl.utils", utils)]:
        monkeypatch.setitem(sys.modules, name, m)
    return built


def test_write_excel_workbook_assembly(spark, tmp_path, fake_openpyxl):
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
    wb = fake_openpyxl[0]
    assert wb.saved_to == out
    assert [ws.title for ws in wb.sheets] == ["Results", "WOS", "PubMed", "ScienceDirect"]

    results = wb.sheets[0]
    assert results.freeze_panes == "A2"
    cols = results.rows[0]
    title_i = cols.index("title") + 1
    doi_i = cols.index("doi_link") + 1
    by_title = {results.cell(r, title_i).value: r for r in range(2, len(results.rows) + 1)}

    ra = by_title["Paper A"]
    assert results.cell(ra, title_i).hyperlink == "https://pubmed.gov/1"
    assert results.cell(ra, doi_i).hyperlink == "https://doi.org/10.1/a"
    assert results.cell(ra, title_i).font is not None
    # long abstract scales the row height; short row clamps to 20
    assert results.row_dimensions[ra].height > 20
    rb = by_title["Paper B"]
    assert results.cell(rb, title_i).hyperlink is None
    assert results.row_dimensions[rb].height == 20

    # per-source sheet filtered by source_type
    pubmed = wb.sheets[2]
    assert len(pubmed.rows) == 2 and pubmed.cell(2, cols.index("title") + 1).value == "Paper A"


def test_write_excel_import_error_without_openpyxl(spark):
    from scholarmind_spark.sinks.excel import write_excel

    if "openpyxl" in sys.modules:
        pytest.skip("real openpyxl present")
    df = spark.createDataFrame([("t",)], "title string")
    with pytest.raises(ImportError, match="write_sheets_csv"):
        write_excel(df, "/tmp/never.xlsx")
