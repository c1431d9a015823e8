"""Minimal xlsx reader/writer on the stdlib only (``zipfile`` + ``xml``).

Why this exists: the reference ingests WOS Excel exports with a driver-side
``pd.read_excel`` (reference ``src/parsers/wos_parser.py:141-148``) and emits
a styled workbook via openpyxl (``src/utils/excel_formatter.py``).  Neither
pandas' Excel engines nor openpyxl ship in this container, so S4 and K1/K2
were env-gated stubs.  An .xlsx file is just a zip of small XML parts
(ECMA-376 / ISO 29500 SpreadsheetML, a public standard), so a purpose-built
subset reader/writer is ~300 lines and removes the dependency entirely.

Scope — exactly what the two call sites need, nothing speculative:

reader (:func:`read_xlsx`)
    - sheet discovery via ``xl/workbook.xml`` + its rels (names in workbook
      order, r:id → part path, so files whose sheets are NOT named
      ``sheetN.xml`` still resolve);
    - shared strings (``<si><t>`` and rich-text ``<si><r><t>..`` runs),
      inline strings, formula-cached ``t="str"``, booleans, numbers
      (integral floats surfaced as ``int``), blank/error cells → ``None``;
    - sparse rows/cells re-densified from the ``r=`` cell references.

writer (:func:`write_xlsx`)
    - multiple sheets, inline strings (no sharedStrings part — simpler,
      and duplicate-string compression is irrelevant at presentation row
      counts), numbers, bools, ``None`` → blank;
    - per-sheet column widths, per-row heights, frozen header pane, and
      hyperlink cells with the link font (blue underline) — the K1/K2
      styling surface of ``excel_formatter.py:280-345``;
    - deterministic output: fixed timestamps in the zip entries so the
      same rows → byte-identical workbook (test- and cache-friendly).

Not supported (documented, will raise or pass through as text): dates as
typed datetimes (WOS exports carry dates as text; Excel serial-date
handling needs the 1900/1904 epoch flag and number formats), merged cells,
formula EVALUATION (cached values are read), charts.

This is presentation/ingest plumbing, not data plane: both call sites are
driver-side by design (Excel is not splittable and caps at ~1M rows; the
scan feeds ``spark.createDataFrame``, the sink drains a small final
DataFrame).  Engine-scale I/O is parquet/ORC elsewhere.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

# ---------------------------------------------------------------------------
# shared helpers

_SSML = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_DOC = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_REL_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"
# fixed zip timestamp (DOS epoch) → byte-identical output for identical input
_ZIP_DATE = (1980, 1, 1, 0, 0, 0)

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")

# Excel's own sheet limits (XFD = 16384 columns, 1048576 rows).  The reader
# densifies sparse refs into lists, so an UNVALIDATED hostile ref like
# r="ZZZZZZZZ1" (col index ~2e11) or <row r="2000000000"> would allocate
# hundreds of GB from a 1 KB file — indexes past these caps raise.
MAX_COLS = 16_384
MAX_ROWS = 1_048_576
# Decompressed-size cap per zip part: sheet XML deflates ~1000:1, so a
# 50 KB zip-bomb workbook could inflate to GBs before any cell logic runs.
MAX_PART_BYTES = 256 * 1024 * 1024


def _read_part(zf, name: str) -> bytes:
    info = zf.getinfo(name)
    if info.file_size > MAX_PART_BYTES:
        raise ValueError(
            f"xlsx part {name} declares {info.file_size} decompressed bytes "
            f"(cap {MAX_PART_BYTES}) — refusing (zip bomb?)"
        )
    return zf.read(name)


def col_letter(idx: int) -> str:
    """0-based column index → A1-style letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def col_index(letters: str) -> int:
    """A1-style letters → 0-based column index (inverse of col_letter)."""
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


# ---------------------------------------------------------------------------
# reader


def _si_text(si: ET.Element) -> str:
    """Text of one sharedStrings <si>: plain <t> or rich-text <r><t> runs.
    Phonetic-guide runs (<rPh>, written by Japanese-locale Excel) are NOT
    part of the cell value and are skipped."""
    parts = []
    for child in si:
        name = _localname(child.tag)
        if name == "t":
            parts.append(child.text or "")
        elif name == "r":  # rich-text run: one <t> inside
            for el in child:
                if _localname(el.tag) == "t":
                    parts.append(el.text or "")
    return "".join(parts)


def _cell_value(cell: ET.Element, shared: list[str]):
    """Typed value of one <c> element (None for blank/error cells)."""
    ctype = cell.get("t", "n")
    v_el = None
    is_el = None
    for child in cell:
        name = _localname(child.tag)
        if name == "v":
            v_el = child
        elif name == "is":
            is_el = child
    if ctype == "inlineStr":
        return _si_text(is_el) if is_el is not None else None
    if v_el is None or v_el.text is None:
        return None
    raw = v_el.text
    if ctype == "s":
        # validate the shared-string index: out-of-range/garbage raised
        # IndexError/ValueError out of the whole scan, and a NEGATIVE
        # index silently resolved to the wrong string via Python slicing
        try:
            idx = int(raw)
        except ValueError as e:
            raise ValueError(f"bad shared-string index {raw!r}") from e
        if not 0 <= idx < len(shared):
            raise ValueError(
                f"shared-string index {idx} out of range ({len(shared)})"
            )
        return shared[idx]
    if ctype == "str":  # formula's cached string result
        return raw
    if ctype == "b":
        return raw == "1"
    if ctype == "e":  # error cell (#DIV/0! etc.)
        return None
    try:
        num = float(raw)
    except ValueError:
        # hostile non-numeric <v> in a default-typed cell: surface the raw
        # text instead of crashing the scan (lossless, caller casts)
        return raw
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def read_xlsx(path: str) -> dict[str, list[list]]:
    """Read every worksheet → ``{sheet_name: rows}`` in workbook order.

    Rows are dense lists (gaps from sparse cell refs filled with ``None``);
    trailing all-None rows are kept only if the sheet XML declared them.
    """
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())

        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(_read_part(zf, "xl/sharedStrings.xml"))
            shared = [_si_text(si) for si in root
                      if _localname(si.tag) == "si"]

        # sheet name → part path, via workbook.xml + workbook rels
        rels = {}
        rels_part = "xl/_rels/workbook.xml.rels"
        if rels_part in names:
            for rel in ET.fromstring(_read_part(zf, rels_part)):
                target = rel.get("Target", "").lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
                rels[rel.get("Id")] = target
        wb = ET.fromstring(_read_part(zf, "xl/workbook.xml"))
        sheets: list[tuple[str, str]] = []
        for el in wb.iter():
            if _localname(el.tag) != "sheet":
                continue
            rid = el.get(f"{{{_REL_DOC}}}id") or el.get("id")
            part = rels.get(rid, f"xl/worksheets/sheet{el.get('sheetId')}.xml")
            sheets.append((el.get("name"), part))

        out: dict[str, list[list]] = {}
        for sheet_name, part in sheets:
            rows: list[list] = []
            root = ET.fromstring(_read_part(zf, part))
            for row_el in root.iter(f"{{{_SSML}}}row"):
                # honor the row's r= index: Excel omits empty rows from the
                # XML entirely, so a gap must re-appear as all-None rows or
                # every later row shifts up to the wrong position
                r_attr = row_el.get("r")
                if r_attr is not None:
                    try:
                        r_no = int(r_attr)
                    except ValueError as e:
                        raise ValueError(f"bad row ref r={r_attr!r}") from e
                    if not 1 <= r_no <= MAX_ROWS:
                        raise ValueError(
                            f"row ref {r_no} outside Excel limits"
                        )
                    while len(rows) < r_no - 1:
                        rows.append([])
                cells: list = []
                for cell in row_el:
                    if _localname(cell.tag) != "c":
                        continue
                    ref = cell.get("r")
                    if ref:
                        m = _CELL_REF.fullmatch(ref)
                        if m is None:
                            raise ValueError(f"bad cell ref {ref!r}")
                        ci = col_index(m.group(1))
                        if ci >= MAX_COLS:
                            raise ValueError(
                                f"cell ref {ref!r} outside Excel limits"
                            )
                    else:  # ref-less cells are sequential
                        ci = len(cells)
                    while len(cells) < ci:
                        cells.append(None)
                    value = _cell_value(cell, shared)
                    if ci < len(cells):
                        cells[ci] = value
                    else:
                        cells.append(value)
                rows.append(cells)
            width = max((len(r) for r in rows), default=0)
            out[sheet_name] = [r + [None] * (width - len(r)) for r in rows]
        return out


def read_xlsx_hyperlinks(path: str) -> dict[str, dict[str, str]]:
    """``{sheet_name: {cell_ref: url}}`` for every external hyperlink —
    the structural companion to :func:`read_xlsx` (golden tests assert
    title-link priority on real workbook bytes with it)."""
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        rels = {}
        rels_part = "xl/_rels/workbook.xml.rels"
        if rels_part in names:
            for rel in ET.fromstring(_read_part(zf, rels_part)):
                target = rel.get("Target", "").lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
                rels[rel.get("Id")] = target
        wb = ET.fromstring(_read_part(zf, "xl/workbook.xml"))
        out: dict[str, dict[str, str]] = {}
        for el in wb.iter():
            if _localname(el.tag) != "sheet":
                continue
            rid = el.get(f"{{{_REL_DOC}}}id") or el.get("id")
            part = rels.get(rid, f"xl/worksheets/sheet{el.get('sheetId')}.xml")
            links: dict[str, str] = {}
            sheet_rels = {}
            rp = part.rsplit("/", 1)
            rel_part = f"{rp[0]}/_rels/{rp[1]}.rels"
            if rel_part in names:
                for rel in ET.fromstring(_read_part(zf, rel_part)):
                    sheet_rels[rel.get("Id")] = rel.get("Target")
            root = ET.fromstring(_read_part(zf, part))
            for h in root.iter(f"{{{_SSML}}}hyperlink"):
                rid_h = h.get(f"{{{_REL_DOC}}}id") or h.get("id")
                url = sheet_rels.get(rid_h)
                if url:
                    links[h.get("ref")] = url
            out[el.get("name")] = links
        return out


# ---------------------------------------------------------------------------
# writer

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
{sheet_overrides}</Types>"""

_ROOT_RELS = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="{_REL_PKG}">
<Relationship Id="rId1" Type="{_REL_DOC}/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

# Two fonts / two cell styles: 0 = default, 1 = hyperlink (blue, underline —
# excel_formatter.py:319,342), 2 = bold white header on solid fill
# (excel_formatter.py:215-216 — fill 366092).  Wrap-text on style 3 for
# data cells; every style carries the reference's all-cell thin border
# (excel_formatter.py:267-279).
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="{ns}">
<fonts count="3">
<font><sz val="11"/><name val="Calibri"/></font>
<font><sz val="11"/><name val="Calibri"/><color rgb="FF{link}"/><u/></font>
<font><sz val="11"/><name val="Calibri"/><b/><color rgb="FFFFFFFF"/></font>
</fonts>
<fills count="3">
<fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FF{fill}"/><bgColor indexed="64"/></patternFill></fill>
</fills>
<borders count="2"><border/>
<border><left style="thin"/><right style="thin"/><top style="thin"/><bottom style="thin"/></border>
</borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="4">
<xf borderId="1" applyBorder="1" xfId="0"/>
<xf fontId="1" borderId="1" applyFont="1" applyBorder="1" xfId="0"/>
<xf fontId="2" fillId="2" borderId="1" applyFont="1" applyFill="1" applyBorder="1" xfId="0"/>
<xf borderId="1" applyAlignment="1" applyBorder="1" xfId="0"><alignment wrapText="1" vertical="top"/></xf>
</cellXfs>
</styleSheet>"""

STYLE_DEFAULT, STYLE_LINK, STYLE_HEADER, STYLE_WRAP = 0, 1, 2, 3


def _cell_xml(ref: str, value, style: int) -> str:
    s = f' s="{style}"' if style else ""
    if value is None:
        return f'<c r="{ref}"{s}/>'
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        # SpreadsheetML has no NaN/Infinity numeric representation —
        # Excel flags the workbook as corrupt; emit a blank cell instead
        if isinstance(value, float) and (value != value or value in
                                         (float("inf"), float("-inf"))):
            return f'<c r="{ref}"{s}/>'
        return f'<c r="{ref}"{s}><v>{value!r}</v></c>'
    text = escape(str(value))
    # strip control chars Excel rejects (keep \t \n \r)
    text = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", text)
    space = ' xml:space="preserve"' if text != text.strip() else ""
    return f'<c r="{ref}"{s} t="inlineStr"><is><t{space}>{text}</t></is></c>'


class Sheet:
    """One worksheet for :func:`write_xlsx`.

    ``rows``: list of value lists (str/int/float/bool/None).
    ``col_widths``: 0-based column index → width in Excel units.
    ``row_heights``: 0-based ROW index → height in points.
    ``hyperlinks``: (row_idx, col_idx) → URL; the cell gets the link style.
    ``header``: style row 0 as a header and freeze the pane under it.
    """

    def __init__(self, rows, col_widths=None, row_heights=None,
                 hyperlinks=None, header=True):
        self.rows = rows
        self.col_widths = col_widths or {}
        self.row_heights = row_heights or {}
        self.hyperlinks = hyperlinks or {}
        self.header = header

    def _xml(self) -> tuple[str, str | None]:
        """→ (sheet xml, rels xml or None)."""
        parts = [f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
                 f'<worksheet xmlns="{_SSML}" xmlns:r="{_REL_DOC}">']
        if self.header:
            parts.append(
                '<sheetViews><sheetView workbookViewId="0">'
                '<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft"'
                ' state="frozen"/></sheetView></sheetViews>')
        if self.col_widths:
            cols = "".join(
                f'<col min="{i + 1}" max="{i + 1}" width="{w}" customWidth="1"/>'
                for i, w in sorted(self.col_widths.items()))
            parts.append(f"<cols>{cols}</cols>")
        parts.append("<sheetData>")
        link_rels: list[tuple[str, str]] = []  # (cell ref, url)
        for ri, row in enumerate(self.rows):
            attrs = ""
            if ri in self.row_heights:
                attrs = f' ht="{self.row_heights[ri]}" customHeight="1"'
            cells = []
            for ci, value in enumerate(row):
                ref = f"{col_letter(ci)}{ri + 1}"
                if self.header and ri == 0:
                    style = STYLE_HEADER
                elif (ri, ci) in self.hyperlinks:
                    style = STYLE_LINK
                    link_rels.append((ref, self.hyperlinks[(ri, ci)]))
                else:
                    style = STYLE_WRAP if self.header else STYLE_DEFAULT
                cells.append(_cell_xml(ref, value, style))
            parts.append(f'<row r="{ri + 1}"{attrs}>{"".join(cells)}</row>')
        parts.append("</sheetData>")
        rels_xml = None
        if link_rels:
            parts.append("<hyperlinks>" + "".join(
                f'<hyperlink ref="{ref}" r:id="rIdH{i}"/>'
                for i, (ref, _) in enumerate(link_rels, 1)) + "</hyperlinks>")
            rels_xml = (
                f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
                f'<Relationships xmlns="{_REL_PKG}">' + "".join(
                    f'<Relationship Id="rIdH{i}" Type="{_REL_DOC}/hyperlink"'
                    f' Target="{escape(url, {chr(34): "&quot;"})}"'
                    f' TargetMode="External"/>'
                    for i, (_, url) in enumerate(link_rels, 1)) +
                "</Relationships>")
        parts.append("</worksheet>")
        return "".join(parts), rels_xml


def write_xlsx(path: str, sheets: dict[str, "Sheet | list[list]"],
               link_color: str = "0563C1",
               header_fill: str = "366092") -> None:
    """Write ``{sheet_name: Sheet-or-rows}`` as a valid .xlsx workbook."""
    norm: dict[str, Sheet] = {
        name: s if isinstance(s, Sheet) else Sheet(s, header=False)
        for name, s in sheets.items()
    }
    n = len(norm)
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
        f'"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        f'worksheet+xml"/>\n'
        for i in range(1, n + 1))
    wb_sheets = "".join(
        f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i}"'
        f' r:id="rId{i}"/>'
        for i, name in enumerate(norm, 1))
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<workbook xmlns="{_SSML}" xmlns:r="{_REL_DOC}">'
        f"<sheets>{wb_sheets}</sheets></workbook>")
    wb_rels = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<Relationships xmlns="{_REL_PKG}">' + "".join(
            f'<Relationship Id="rId{i}" Type="{_REL_DOC}/worksheet"'
            f' Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, n + 1)) +
        f'<Relationship Id="rId{n + 1}" Type="{_REL_DOC}/styles"'
        f' Target="styles.xml"/></Relationships>')

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        def add(name: str, data: str) -> None:
            info = zipfile.ZipInfo(name, date_time=_ZIP_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)

        add("[Content_Types].xml",
            _CONTENT_TYPES.format(sheet_overrides=overrides))
        add("_rels/.rels", _ROOT_RELS)
        add("xl/workbook.xml", workbook)
        add("xl/_rels/workbook.xml.rels", wb_rels)
        add("xl/styles.xml",
            _STYLES.format(ns=_SSML, link=link_color, fill=header_fill))
        for i, sheet in enumerate(norm.values(), 1):
            xml, rels = sheet._xml()
            add(f"xl/worksheets/sheet{i}.xml", xml)
            if rels:
                add(f"xl/worksheets/_rels/sheet{i}.xml.rels", rels)
