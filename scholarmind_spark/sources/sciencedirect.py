"""ScienceDirect free-text citation scan (reference S5,
``src/parsers/sciencedirect_parser.py:17-253``).

Entries split on 2+ newlines; positional parse (line0=authors, line1=title,
line2=journal); validity requires ≥3 lines plus all of {``Volume \\d+``,
``Abstract``, ``Keywords``} (``:86-105``); regex field extraction for
DOI/URL/volume/issue/year/pages; abstract is the stateful line window
between the ``Abstract`` and ``Keywords`` markers (``:195-221``); keyword
separator ``;`` → ``, `` (``:246-251``) and split to an array.

This is the one parser SURVEY §2.1 recommends keeping as Python inside
``mapInPandas`` — the abstract extraction is a stateful scan over lines.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from scholarmind_spark.sources.base import empty_record, scan_files

DOI_RE = re.compile(r"(?:https://doi\.org/|[Dd][Oo][Ii]:\s*|/)(10\.[0-9.]+/[^\s,]+)")
URL_RE = re.compile(r"(https?://[^\s)]+)")
VOL_ISSUE_RE = re.compile(r"Volume\s+(\d+),\s+Issue\s+(\d+)")
VOL_RE = re.compile(r"Volume\s+(\d+)")
ISSUE_RE = re.compile(r"Issue\s+(\d+)")
# bounded years only: this regex scans arbitrary citation lines (unlike
# functions/text.py's D2 YEAR_RE, which reads a DATE field), so a bare
# \d{4} would grab "2010" from a title range or "1016" from a DOI
YEAR_RE = re.compile(r"\b((?:19|20)\d{2})\b")
YEAR_LINE_RE = re.compile(r"^\s*((?:19|20)\d{2})\s*,?\s*$")
PAGES_RE = re.compile(r"(?:pages|Pages)\s+([A-Za-z0-9-]+)")
# Documented deviation: the reference's article-id fallback
# (r'([0-9a-zA-Z]+),' + startswith, sciencedirect_parser.py:144,187-192)
# happily captures an author surname ("Brown, K.") or the year line as
# pages.  Canonical rule here: an article id is letter+digits occupying the
# whole line (e.g. "e25469,").
ARTICLE_ID_RE = re.compile(r"^([A-Za-z]\d+),?$")
AUTHOR_RE = re.compile(r"([^,]+,[^,]+),\s*")


def parse_sd_entry(entry: str) -> dict[str, Any] | None:
    lines = entry.split("\n")
    if len(lines) < 3:  # authors + title + journal minimum (:86-89)
        return None
    has_volume = any(VOL_RE.search(line) for line in lines)
    has_abstract = "Abstract" in entry
    has_keywords = "Keywords" in entry
    if not (has_volume and has_abstract and has_keywords):  # :99-105
        return None

    rec = empty_record()
    authors_raw = lines[0].strip().rstrip(",").strip()
    matches = AUTHOR_RE.findall(authors_raw + ",")
    rec["authors"] = [a.strip() for a in matches] if matches else [authors_raw]
    rec["full_authors"] = [authors_raw]
    rec["title"] = lines[1].strip()
    rec["journal"] = lines[2].strip().rstrip(",").strip()

    # bibliographic fields live in the citation HEADER; scanning past the
    # Abstract marker let Volume/Pages/year-shaped strings inside the
    # abstract body overwrite the real values
    header_end = len(lines)
    for i, line in enumerate(lines):
        if line.startswith("Abstract:") or line == "Abstract":
            header_end = i
            break
    year = None
    year_is_from_line = False
    for line in lines[:header_end]:
        if "https://doi.org/" in line or "doi:" in line.lower() or "/10." in line:
            m = DOI_RE.search(line)
            if m:
                rec["doi"] = m.group(1).strip().rstrip(".")
        if "sciencedirect.com" in line:
            m = URL_RE.search(line)
            if m:
                rec["url"] = m.group(1).strip().rstrip(".")
        m = VOL_ISSUE_RE.search(line)
        if m:
            rec["volume"], rec["issue"] = m.group(1), m.group(2)
        else:
            m = VOL_RE.search(line)
            if m:
                rec["volume"] = m.group(1)
            m = ISSUE_RE.search(line)
            if m:
                rec["issue"] = m.group(1)
        # a line that IS a year (SD's citation format puts it alone,
        # "2024,") always wins; a year-shaped run inside another line
        # (title ranges like "Trends 2010-2023") is only the fallback
        m = YEAR_LINE_RE.match(line)
        if m and not year_is_from_line:
            year = m.group(1)
            year_is_from_line = True
        elif year is None:
            m = YEAR_RE.search(line)
            if m:
                year = m.group(1)
        m = PAGES_RE.search(line)
        if m:
            rec["pages"] = m.group(1)
        elif rec["pages"] is None:
            m = ARTICLE_ID_RE.match(line.strip())
            if m:
                rec["pages"] = m.group(1)
    rec["publication_date"] = year
    rec["publication_year"] = year

    # abstract: between the Abstract marker and the Keywords marker (:195-221)
    abstract_idx = keywords_idx = -1
    abstract_text = ""
    for i, line in enumerate(lines):
        if (line.startswith("Abstract:") or line == "Abstract") and abstract_idx == -1:
            abstract_idx = i
            if ":" in line:
                abstract_text = line.split(":", 1)[1].strip() + " "
        elif (line.startswith("Keywords:") or line == "Keywords") and keywords_idx == -1:
            keywords_idx = i
            break
    if abstract_idx != -1 and keywords_idx != -1:
        body = " ".join(
            line.strip() for line in lines[abstract_idx + 1 : keywords_idx] if line.strip()
        )
        rec["abstract"] = (abstract_text + body).strip()

    # keywords: after the marker until a blank/section line (:224-251)
    if keywords_idx != -1:
        kw_line = lines[keywords_idx]
        kw = kw_line.split(":", 1)[1].strip() if ":" in kw_line else ""
        i = keywords_idx + 1
        while i < len(lines) and lines[i].strip():
            if lines[i].strip().startswith(("Background", "Methods", "Results", "Conclusion")):
                break
            kw += " " + lines[i].strip()
            i += 1
        kw = kw.strip()
        if kw:
            sep = ";" if ";" in kw else ","
            rec["keywords"] = [k.strip() for k in kw.split(sep) if k.strip()]
    return rec


def parse_sd_file(text: str) -> list[dict[str, Any]]:
    from scholarmind_spark.sources.base import normalize_newlines

    text = normalize_newlines(text)
    out = []
    for entry in re.split(r"\n{2,}", text):
        if not entry.strip():
            continue
        rec = parse_sd_entry(entry.strip())
        if rec:
            out.append(rec)
    return out


def scan_sciencedirect(spark: SparkSession, path: str) -> DataFrame:
    return scan_files(spark, path, parse_sd_file, "sciencedirect")
