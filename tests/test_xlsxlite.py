"""Vendored stdlib xlsx reader/writer (unblocks S4 ingest and the K1/K2
sink in a container without pandas Excel engines / openpyxl).

Covers: typed round-trip (str/int/float/bool/None, XML-hostile chars,
unicode, leading/trailing whitespace), multi-sheet ordering, sparse-cell
densification, the sharedStrings + rich-text reader path (what
openpyxl/pandas-written files actually use — hand-assembled here), and
the real S4 golden: a WOS export workbook → ``scan_wos_excel`` →
standardized records.
"""

from __future__ import annotations

import zipfile

import pytest

from scholarmind_spark.xlsxlite import (
    Sheet,
    col_index,
    col_letter,
    read_xlsx,
    write_xlsx,
)


def test_col_letters_roundtrip():
    for i in [0, 1, 25, 26, 27, 51, 52, 701, 702, 16383]:
        assert col_index(col_letter(i)) == i
    assert col_letter(0) == "A" and col_letter(26) == "AA" and col_letter(701) == "ZZ"


def test_roundtrip_types(tmp_path):
    rows = [
        ["s", "i", "f", "b", "none"],
        ["plain", 42, 3.25, True, None],
        ["<tag> & \"quote\" 'tick'", -7, -0.5, False, None],
        ["ünïcødé — 中文 🎉", 2**40, 1e-9, True, "x"],
        ["  leading/trailing  ", 0, 0.0, False, None],
        ["line1\nline2\ttabbed", 1, 1.5, True, None],
    ]
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, {"data": rows})
    back = read_xlsx(p)
    assert list(back) == ["data"]
    got = back["data"]
    assert got[1] == ["plain", 42, 3.25, True, None]
    assert got[2][0] == "<tag> & \"quote\" 'tick'"
    assert got[3][0] == "ünïcødé — 中文 🎉"
    assert got[3][1] == 2**40 and got[3][2] == 1e-9
    # xml:space="preserve" keeps surrounding whitespace
    assert got[4][0] == "  leading/trailing  "
    assert got[5][0] == "line1\nline2\ttabbed"
    # 0.0 is surfaced as int 0 (integral float) — callers stringify anyway
    assert got[4][1] == 0 and got[4][2] == 0


def test_multi_sheet_order_and_widths(tmp_path):
    p = str(tmp_path / "m.xlsx")
    write_xlsx(p, {
        "Zeta": [["z"]],
        "Alpha": Sheet([["h1", "h2"], ["a", 1]], col_widths={0: 24},
                       row_heights={1: 45}, header=True),
    })
    back = read_xlsx(p)
    assert list(back) == ["Zeta", "Alpha"]  # insertion order, not sorted
    assert back["Alpha"] == [["h1", "h2"], ["a", 1]]
    with zipfile.ZipFile(p) as zf:
        xml = zf.read("xl/worksheets/sheet2.xml").decode()
        assert 'width="24"' in xml and 'ht="45"' in xml


def test_hyperlink_parts(tmp_path):
    p = str(tmp_path / "h.xlsx")
    url = "https://doi.org/10.1000/a?b=1&c=2"
    write_xlsx(p, {"s": Sheet([["title"], ["Paper"]],
                              hyperlinks={(1, 0): url}, header=True)})
    with zipfile.ZipFile(p) as zf:
        assert '<hyperlink ref="A2"' in zf.read("xl/worksheets/sheet1.xml").decode()
        rels = zf.read("xl/worksheets/_rels/sheet1.xml.rels").decode()
        assert "b=1&amp;c=2" in rels and 'TargetMode="External"' in rels
    assert read_xlsx(p)["s"] == [["title"], ["Paper"]]


def test_reader_shared_strings_and_sparse_cells(tmp_path):
    """Hand-assembled workbook in the dialect pandas/openpyxl WRITE:
    sharedStrings (incl. a rich-text run), sparse cell refs skipping
    columns, formula cached values, an error cell."""
    ssml = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg = "http://schemas.openxmlformats.org/package/2006/relationships"
    sheet = f"""<?xml version="1.0"?>
<worksheet xmlns="{ssml}"><sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>
<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="b"><v>1</v></c>
<c r="C2" t="str"><f>CONCAT("a","b")</f><v>ab</v></c></row>
<row r="3"><c r="B3" t="e"><v>#DIV/0!</v></c><c r="C3"><v>2.5</v></c></row>
</sheetData></worksheet>"""
    shared = f"""<?xml version="1.0"?>
<sst xmlns="{ssml}" count="2" uniqueCount="2">
<si><t>head</t></si>
<si><r><t>rich</t></r><r><t> text</t></r></si>
</sst>"""
    wb = f"""<?xml version="1.0"?>
<workbook xmlns="{ssml}" xmlns:r="{rel}">
<sheets><sheet name="S One" sheetId="1" r:id="rId9"/></sheets></workbook>"""
    wb_rels = f"""<?xml version="1.0"?>
<Relationships xmlns="{pkg}">
<Relationship Id="rId9" Type="{rel}/worksheet" Target="worksheets/oddname.xml"/>
</Relationships>"""
    p = str(tmp_path / "ss.xlsx")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/oddname.xml", sheet)  # non-sheetN name
    got = read_xlsx(p)
    assert list(got) == ["S One"]
    assert got["S One"] == [
        ["head", None, "rich text"],
        [7, True, "ab"],
        [None, None, 2.5],
    ]


WOS_HEADER = ["Article Title", "Authors", "Source Title", "Publication Year",
              "DOI", "Abstract", "Author Keywords", "UT (Unique WOS ID)",
              "Times Cited, All Databases"]


def _wos_workbook(path: str) -> None:
    rows = [
        WOS_HEADER,
        ["Deep learning for X", "Smith, J; Lee, K", "Nature Things", 2021,
         "10.1000/abc", "We study X.", "deep learning; x", "WOS:001", 12],
        ["No abstract paper", "Solo, A", "J Empty", 2020,
         "10.1000/def", None, "empty", "WOS:002", 0],
        ["Another paper", "Wu, Q", "Science Stuff", 2019.0,
         "10.1000/ghi", "More text.", "y; z", "WOS:003", 3],
    ]
    write_xlsx(path, {"savedrecs": rows})


def test_scan_wos_excel_golden(spark, tmp_path, monkeypatch):
    """S4 end-to-end on a REAL .xlsx: engine-less path (pandas read_excel
    forced to ImportError) → xlsxlite → normalize_wos_tabular."""
    import pandas as pd

    from scholarmind_spark.sources.wos import scan_wos_excel

    p = str(tmp_path / "savedrecs.xlsx")
    _wos_workbook(p)

    def _no_engine(*a, **kw):
        raise ImportError("Missing optional dependency 'openpyxl'")

    monkeypatch.setattr(pd, "read_excel", _no_engine)
    df = scan_wos_excel(spark, p)
    rows = {r["title"]: r for r in df.collect()}
    # P4: the no-abstract row is filtered
    assert set(rows) == {"Deep learning for X", "Another paper"}
    r = rows["Deep learning for X"]
    assert r["authors"] == ["Smith, J", "Lee, K"]  # ';'-split + trim
    assert r["journal"] == "Nature Things"
    assert r["publication_year"] == "2021"
    assert r["doi"] == "10.1000/abc"
    assert r["source_type"] == "wos"  # P3
    assert r["record_id"] is not None
    # Excel float-typed year (2019.0) renders without the trailing .0
    assert rows["Another paper"]["publication_year"] == "2019"


def test_scan_wos_excel_empty_workbook(spark, tmp_path, monkeypatch):
    import pandas as pd

    from scholarmind_spark.sources.wos import scan_wos_excel

    p = str(tmp_path / "empty.xlsx")
    write_xlsx(p, {"Sheet1": []})
    monkeypatch.setattr(pd, "read_excel",
                        lambda *a, **kw: (_ for _ in ()).throw(ImportError()))
    with pytest.raises(ValueError, match="empty"):
        scan_wos_excel(spark, p)


def test_nonfinite_floats_write_blank_cells(tmp_path):
    p = str(tmp_path / "nf.xlsx")
    write_xlsx(p, {"s": [["a", "b", "c", "d"],
                         [float("nan"), float("inf"), float("-inf"), 1.5]]})
    with zipfile.ZipFile(p) as zf:
        xml = zf.read("xl/worksheets/sheet1.xml").decode()
        assert "nan" not in xml and "inf" not in xml
    assert read_xlsx(p)["s"][1] == [None, None, None, 1.5]


def test_reader_honors_row_gaps_and_skips_phonetic_runs(tmp_path):
    """Excel omits empty rows from the XML (r= indices jump) and stores
    phonetic furigana in <rPh> runs — neither may corrupt the grid."""
    ssml = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = f"""<?xml version="1.0"?>
<worksheet xmlns="{ssml}"><sheetData>
<row r="2"><c r="A2" t="s"><v>0</v></c></row>
<row r="5"><c r="B5"><v>7</v></c></row>
</sheetData></worksheet>"""
    shared = f"""<?xml version="1.0"?>
<sst xmlns="{ssml}"><si><t>東京</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh></si></sst>"""
    wb = f"""<?xml version="1.0"?>
<workbook xmlns="{ssml}"><sheets><sheet name="S" sheetId="1"/></sheets></workbook>"""
    p = str(tmp_path / "gap.xlsx")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    got = read_xlsx(p)["S"]
    assert len(got) == 5  # rows 1..5, gaps present
    assert got[0] == [None, None] and got[2] == [None, None]
    assert got[1][0] == "東京"  # phonetic run excluded
    assert got[4][1] == 7


def _hostile_xlsx(tmp_path, sheet_xml, shared_xml=None):
    import zipfile

    p = str(tmp_path / "hostile.xlsx")
    ssml = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg = "http://schemas.openxmlformats.org/package/2006/relationships"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml",
            f'<workbook xmlns="{ssml}" xmlns:r="{rel}">'
            f'<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>')
        zf.writestr("xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{pkg}">'
            f'<Relationship Id="rId1" Type="{rel}/worksheet" Target="worksheets/sheet1.xml"/>'
            f'</Relationships>')
        zf.writestr("xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ssml}"><sheetData>{sheet_xml}</sheetData></worksheet>')
        if shared_xml is not None:
            zf.writestr("xl/sharedStrings.xml",
                f'<sst xmlns="{ssml}">{shared_xml}</sst>')
    return p


def test_hostile_row_ref_raises_not_ooms(tmp_path):
    import pytest

    from scholarmind_spark.xlsxlite import read_xlsx

    p = _hostile_xlsx(tmp_path, '<row r="2000000000"><c t="str"><v>x</v></c></row>')
    with pytest.raises(ValueError, match="outside Excel limits"):
        read_xlsx(p)


def test_hostile_col_ref_raises_not_ooms(tmp_path):
    import pytest

    from scholarmind_spark.xlsxlite import read_xlsx

    p = _hostile_xlsx(tmp_path, '<row r="1"><c r="ZZZZZZZZ1" t="str"><v>x</v></c></row>')
    with pytest.raises(ValueError, match="outside Excel limits"):
        read_xlsx(p)
    p2 = _hostile_xlsx(tmp_path, '<row r="1"><c r="a1" t="str"><v>x</v></c></row>')
    with pytest.raises(ValueError, match="bad cell ref"):
        read_xlsx(p2)


def test_shared_string_index_validated(tmp_path):
    import pytest

    from scholarmind_spark.xlsxlite import read_xlsx

    bad = _hostile_xlsx(tmp_path, '<row r="1"><c t="s"><v>99</v></c></row>',
                        shared_xml="<si><t>only</t></si>")
    with pytest.raises(ValueError, match="out of range"):
        read_xlsx(bad)
    neg = _hostile_xlsx(tmp_path, '<row r="1"><c t="s"><v>-1</v></c></row>',
                        shared_xml="<si><t>only</t></si>")
    with pytest.raises(ValueError, match="out of range"):
        read_xlsx(neg)


def test_non_numeric_default_cell_surfaces_as_text(tmp_path):
    from scholarmind_spark.xlsxlite import read_xlsx

    p = _hostile_xlsx(tmp_path, '<row r="1"><c r="A1"><v>notanumber</v></c></row>')
    assert read_xlsx(p) == {"S": [["notanumber"]]}


def test_zip_part_size_cap(tmp_path, monkeypatch):
    import pytest

    from scholarmind_spark import xlsxlite

    p = _hostile_xlsx(tmp_path, '<row r="1"><c r="A1" t="str"><v>x</v></c></row>')
    monkeypatch.setattr(xlsxlite, "MAX_PART_BYTES", 10)
    with pytest.raises(ValueError, match="zip bomb"):
        xlsxlite.read_xlsx(p)
