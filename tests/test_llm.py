"""U1/U2/D12: template registry, parse fallback ladder, keyed LLM map."""

from __future__ import annotations

import json

import pytest

from scholarmind_spark.llm import (
    MEDICAL,
    MockLLMClient,
    PromptTemplate,
    llm_extract,
    load_template_yaml,
    parse_llm_response,
)

T = PromptTemplate(
    type="t",
    name="t",
    system="s",
    user_template="{abstract}",
    fields=("ai_summary", "research_purpose"),
    default_values={"ai_summary": "", "research_purpose": "未明确描述"},
)


def test_parse_fenced_json():
    r = parse_llm_response('```json\n{"ai_summary": "a", "research_purpose": "b"}\n```', T)
    assert r == {"ai_summary": "a", "research_purpose": "b"}


def test_parse_bare_json():
    r = parse_llm_response('{"ai_summary": "a"}', T)
    assert r == {"ai_summary": "a", "research_purpose": "未明确描述"}


def test_parse_json_in_prose():
    r = parse_llm_response('Sure! {"research_purpose": "find stuff"} hope that helps', T)
    assert r["research_purpose"] == "find stuff"


def test_parse_field_fragments():
    r = parse_llm_response('"ai_summary": "frag a"\n"research_purpose": "frag b"\n', T)
    assert r == {"ai_summary": "frag a", "research_purpose": "frag b"}


def test_parse_prose_fallback_to_summary():
    r = parse_llm_response("just a plain prose answer", T)
    assert r["ai_summary"] == "just a plain prose answer"
    assert r["research_purpose"] == "未明确描述"


def test_parse_garbage_and_none():
    assert parse_llm_response("", T)["research_purpose"] == "未明确描述"
    assert parse_llm_response(None, T)["ai_summary"] == ""


def test_template_yaml_roundtrip():
    t = load_template_yaml(
        "type: yamltest\nfields:\n  - ai_summary\n  - x\ndefault_values:\n  x: dx\n"
    )
    assert t.fields == ("ai_summary", "x")
    assert t.default_for("x") == "dx"
    assert t.default_for("ai_summary") == ""
    assert [f.name for f in t.output_schema().fields] == ["ai_summary", "x"]


def test_llm_extract_keyed_join(spark):
    df = spark.createDataFrame(
        [(10, "abstract ten"), (20, None), (30, "abstract thirty")],
        "record_id long, abstract string",
    )
    client = MockLLMClient(fields=MEDICAL.fields, mode="json")
    out = llm_extract(df, MEDICAL, client).collect()
    rows = {r.record_id: r for r in out}
    assert set(rows) == {10, 20, 30}
    # null abstract → defaults, no call
    assert rows[20].research_purpose == "未明确描述"
    # deterministic mock: same input → same output, keyed not positional
    expected = json.loads(client(MEDICAL.messages("abstract ten")))
    assert rows[10].research_purpose == expected["research_purpose"]
    assert rows[10].abstract == "abstract ten"


def test_llm_extract_cycle_modes_all_parse(spark):
    df = spark.createDataFrame(
        [(i, f"abstract number {i}") for i in range(24)],
        "record_id long, abstract string",
    )
    client = MockLLMClient(fields=MEDICAL.fields)
    out = llm_extract(df, MEDICAL, client).collect()
    assert len(out) == 24
    for r in out:
        assert r.research_purpose  # never null/empty: value or default


def test_template_fields_must_be_string_list():
    import pytest

    from scholarmind_spark.llm.templates import load_template_yaml

    with pytest.raises(ValueError, match="list of names"):
        load_template_yaml("type: t1\nfields: summary\n")  # scalar typo
    with pytest.raises(ValueError, match="non-empty strings"):
        load_template_yaml("type: t2\nfields: [1, 2]\n")
    with pytest.raises(ValueError, match="non-empty strings"):
        load_template_yaml("type: t3\nfields: []\n")
