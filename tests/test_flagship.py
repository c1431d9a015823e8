"""Golden pin for the driver flagship ``entry()``.

The driver smoke-checks ``entry()`` every round but only for
"runs, >= 0 rows, stable schema" — without this pin a value regression
(a dedup survivor change, a broken LLM attach) would only surface in
the driver's next round.  Values measured at sf0.001 and re-verified by
the round-8 judge: per-source record counts 11/35/16/40 and every
record's LLM summary attached (n_llm_ok == n_records)."""

import sys

sys.path.insert(0, "/root/repo")


def test_entry_golden_sf0001(spark):
    import __spark_entry__ as e

    rows = {r["source_type"]: r for r in e.entry(spark).collect()}
    assert {k: r["n_records"] for k, r in rows.items()} == {
        "other": 11,
        "pubmed": 35,
        "sciencedirect": 16,
        "wos": 40,
    }
    for r in rows.values():
        # the whole U1/J2 path: every surviving record got a keyed,
        # well-formed LLM summary back
        assert r["n_llm_ok"] == r["n_records"]
        # enrich/quality joins produced real numbers, not nulls
        assert r["avg_tokens"] is not None and r["avg_tokens"] > 0
        assert r["avg_quality"] is not None
        assert 0 <= r["n_with_doi"] <= r["n_records"]


def test_entry_schema_stable(spark):
    import __spark_entry__ as e

    assert [f.name for f in e.entry(spark).schema.fields] == [
        "source_type",
        "n_records",
        "avg_tokens",
        "avg_quality",
        "n_with_doi",
        "n_llm_ok",
    ]
