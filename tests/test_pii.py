"""Structural PII detection/redaction (operators/pii): per-category
matching, pattern-order safety (card vs phone digit shapes), prose
numerals surviving, idempotent redaction, and Spark/DuckDB twin parity
on the same strings."""

from __future__ import annotations

import duckdb

from scholarmind_spark.operators.pii import (
    PII_PATTERNS,
    redact_pii,
    redact_pii_sql_expr,
    with_pii_counts,
    with_pii_counts_sql,
)

ROWS = [
    (1, "mail me at jane.doe+spam@sub.example.co.uk today"),
    (2, "server at 192.168.0.1 and 10.0.255.17 rebooted"),
    (3, "card 4111-1111-1111-1111 or 4111 1111 1111 1111"),
    (4, "ssn 078-05-1120 on file"),
    (5, "call 555-867-5309 or 555.867.5309"),
    (6, "in 1984 there were 12345 events over 3.14 units v2.0"),  # no PII
    (7, "mixed: a@b.io, 8.8.8.8, 555-123-4567"),
    (8, ""),
]


def test_counts_per_category(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_pii_counts(df, "text").collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_pii"] == 1
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_card"] == 2 and got[3]["n_phone"] == 0  # order-shape safety
    assert got[4]["n_ssn"] == 1 and got[4]["n_phone"] == 0
    assert got[5]["n_phone"] == 2
    assert got[6]["n_pii"] == 0  # prose numerals untouched
    assert got[7]["n_pii"] == 3
    assert got[8]["n_pii"] == 0


def test_redaction_and_idempotence(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    once = {r["doc_id"]: r["text"] for r in redact_pii(df, "text").collect()}
    assert once[1] == "mail me at [EMAIL] today"
    assert once[2] == "server at [IP] and [IP] rebooted"
    assert once[3] == "card [CARD] or [CARD]"
    assert once[4] == "ssn [SSN] on file"
    assert once[5] == "call [PHONE] or [PHONE]"
    assert once[6] == ROWS[5][1]  # unchanged
    assert once[7] == "mixed: [EMAIL], [IP], [PHONE]"
    twice = {
        r["doc_id"]: r["text"]
        for r in redact_pii(redact_pii(df, "text"), "text").collect()
    }
    assert twice == once


def test_duckdb_twins_match(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    s_counts = sorted(
        tuple(r) for r in with_pii_counts(df, "text")
        .select("doc_id", "n_email", "n_ipv4", "n_card", "n_ssn", "n_phone", "n_pii")
        .collect()
    )
    s_redact = sorted(tuple(r) for r in redact_pii(df, "text").collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    d_counts = sorted(con.execute(
        "SELECT doc_id, n_email, n_ipv4, n_card, n_ssn, n_phone, n_pii FROM ("
        + with_pii_counts_sql("t") + ")"
    ).fetchall())
    d_redact = sorted(con.execute(
        f"SELECT doc_id, {redact_pii_sql_expr('text')} FROM t"
    ).fetchall())
    assert s_counts == d_counts
    assert s_redact == d_redact


def test_patterns_have_no_dialect_specials():
    """Both dialects must parse every pattern identically: no lookaround,
    no backrefs, no \\p classes (the constructs Java and RE2 disagree on)."""
    for _, pat, _ in PII_PATTERNS:
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat
        assert "\\p" not in pat and "\\1" not in pat


# ------------------------------------------------------- Luhn validation

def test_luhn_known_numbers(spark):
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.pii import luhn_valid

    cases = [
        ("4111111111111111", True),   # classic Visa test number
        ("4111 1111 1111 1111", True),  # separators ignored
        ("4539-5787-6362-1486", True),
        ("4111111111111112", False),  # off-by-one check digit
        ("79927398713", False),       # Luhn-valid but < 13 digits
        ("1234567890123", False),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["s"])
    got = {
        r["s"]: r["ok"]
        for r in df.select("s", luhn_valid(F.col("s")).alias("ok")).collect()
    }
    assert got == dict(cases)


def test_card_validation_counts_and_twin(spark):
    import duckdb

    from scholarmind_spark.operators.pii import (
        with_card_validation,
        with_card_validation_sql,
    )

    texts = [
        ("pay 4111 1111 1111 1111 now or 1234567890123 maybe",),
        ("order 123456 has no card",),
        ("two: 4539578763621486 and 4111-1111-1111-1112",),
    ]
    df = spark.createDataFrame(texts, ["text"])
    srows = [tuple(r) for r in with_card_validation(df).collect()]
    assert srows == [
        (texts[0][0], 2, 1),
        (texts[1][0], 0, 0),
        (texts[2][0], 2, 1),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE tx (text VARCHAR)")
    con.executemany("INSERT INTO tx VALUES (?)", texts)
    orows = con.execute(with_card_validation_sql("tx")).fetchall()
    assert sorted(srows) == sorted(orows)


def test_luhn_rejects_random_runs_at_ten_percent(spark):
    # deterministic pseudo-random 16-digit runs: ~10% should pass — the
    # false-positive cut the validator exists for (exactly the runs whose
    # implied check digit happens to match)
    from pyspark.sql import functions as F

    from scholarmind_spark.operators.pii import luhn_valid

    df = spark.range(0, 500).select(
        F.lpad(((F.col("id") * 6121212121) % 9999999999999999).cast("string"), 16, "0").alias("s")
    )
    n_valid = df.filter(luhn_valid(F.col("s"))).count()
    assert 20 <= n_valid <= 80  # ≈10% of 500, generous band


def test_luhn_rejects_overlong_runs(spark):
    # 20 zeros sum to 0 (mod 10) but sit outside the 13-19 ISO envelope
    from pyspark.sql import functions as F

    import duckdb

    from scholarmind_spark.operators.pii import luhn_valid, luhn_valid_sql

    df = spark.createDataFrame([("0" * 20,), ("0" * 16,)], ["s"])
    got = {
        r["s"]: r["ok"]
        for r in df.select("s", luhn_valid(F.col("s")).alias("ok")).collect()
    }
    assert got == {"0" * 20: False, "0" * 16: True}
    con = duckdb.connect()
    assert con.execute(
        f"SELECT {luhn_valid_sql(chr(39) + '0' * 20 + chr(39))}"
    ).fetchone()[0] is False
