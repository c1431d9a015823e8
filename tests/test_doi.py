"""Table-driven tests for D1 DOI normalization — every branch of the
reference cleaner (main.py:79-99 + the scan-loop variant :123-144)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from scholarmind_spark.functions.doi import doi_link, doi_norm, doi_norm_sql

CASES = [
    # (raw, expected)
    ("10.1000/jer.2023.001", "10.1000/jer.2023.001"),
    ("10.1000/jer.2023.001 [doi]", "10.1000/jer.2023.001"),
    ("S0000-0000(23)00001-1 [pii]", "s0000-0000(23)00001-1"),
    ("https://doi.org/10.1000/JER.2023.001", "10.1000/jer.2023.001"),
    ("doi:10.1000/jer.2023.001 ", "10.1000/jer.2023.001"),
    ("somepii, 10.1000/jer.2023.001", "10.1000/jer.2023.001"),
    ("  10.1/X  ", "10.1/x"),
    ("a, b", "a, b"),  # comma list without a 10.* part keeps the whole string
    ("", ""),
    (None, None),
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["doi"])
    rows = df.select(
        doi_norm(F.col("doi")).alias("norm"), doi_link(F.col("doi")).alias("link")
    ).collect()
    return rows


def test_doi_norm_branches(result):
    for (raw, expected), row in zip(CASES, result):
        assert row.norm == expected, f"doi_norm({raw!r})"


def test_doi_link(result):
    for (raw, expected), row in zip(CASES, result):
        want = f"https://doi.org/{expected}" if expected else ""
        assert row.link == want, f"doi_link({raw!r})"


def test_sql_mirror_agrees():
    """doi_norm_sql must compute the identical value in DuckDB."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doi VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c[0],) for c in CASES])
    got = con.execute(f"SELECT {doi_norm_sql('doi')} FROM t").fetchall()
    for (raw, expected), (val,) in zip(CASES, got):
        assert val == expected, f"sql doi_norm({raw!r})"
