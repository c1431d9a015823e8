"""Prompt-template registry (reference U2,
``src/api/prompt_templates.py:46-216``).

A template defines ``type, name, system, user_template, fields,
default_values`` and compiles to the output StructType of the LLM map —
one string column per field, with per-field defaults used by the response
parser (reference spec README.md:173-213).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import StringType, StructField, StructType


@dataclass(frozen=True)
class PromptTemplate:
    type: str
    name: str
    system: str
    user_template: str
    fields: tuple[str, ...]
    default_values: dict[str, str] = field(default_factory=dict)

    def default_for(self, f: str) -> str:
        """Per-field default; reference fallback is '未识别' except
        ai_summary → '' (llm_api.py:25)."""
        if f in self.default_values:
            return self.default_values[f]
        return "" if f == "ai_summary" else "未识别"

    def output_schema(self) -> StructType:
        return StructType([StructField(f, StringType(), True) for f in self.fields])

    def messages(self, abstract: str) -> list[dict[str, str]]:
        """2-message chat prompt with {abstract} substitution
        (prompt_templates.py:128-133)."""
        return [
            {"role": "system", "content": self.system},
            {"role": "user", "content": self.user_template.replace("{abstract}", abstract)},
        ]


# Built-in templates mirroring the reference's field sets
# (src/config/prompts/medical.yaml:27-39, medical_computer.yaml:31-51,
#  custom.yaml:31-41).  Prompt text is engine-neutral — semantics live in
# the fields/defaults, which drive the output schema and parse fallbacks.
MEDICAL = PromptTemplate(
    type="medical",
    name="medical literature analysis",
    system="You are a research-literature assistant. Reply with strict JSON only.",
    user_template=(
        "Analyze the following abstract and reply as JSON with keys "
        "ai_summary, research_purpose, research_methods, major_findings, "
        "clinical_significance:\n\n{abstract}"
    ),
    fields=(
        "ai_summary",
        "research_purpose",
        "research_methods",
        "major_findings",
        "clinical_significance",
    ),
    default_values={
        "ai_summary": "",
        "research_purpose": "未明确描述",
        "research_methods": "未详细说明",
        "major_findings": "未明确提及",
        "clinical_significance": "未明确提及",
    },
)

CUSTOM = PromptTemplate(
    type="custom",
    name="custom analysis",
    system="You are a research-literature assistant. Reply with strict JSON only.",
    user_template=(
        "Analyze the abstract; reply as JSON with keys ai_summary, "
        "key_points, methodology, conclusions:\n\n{abstract}"
    ),
    fields=("ai_summary", "key_points", "methodology", "conclusions"),
    default_values={"ai_summary": ""},
)

_REGISTRY: dict[str, PromptTemplate] = {}


def register_template(t: PromptTemplate) -> None:
    _REGISTRY[t.type] = t


def get_template(type_: str) -> PromptTemplate:
    try:
        return _REGISTRY[type_]
    except KeyError:
        raise ValueError(f"unknown prompt template: {type_!r}") from None


def list_templates() -> list[str]:
    return sorted(_REGISTRY)


def load_template_yaml(text: str) -> PromptTemplate:
    """Parse a YAML template document (reference prompt_templates.py:46-104)."""
    import yaml

    data = yaml.safe_load(text)
    t = PromptTemplate(
        type=data["type"],
        name=data.get("name", data["type"]),
        system=data.get("system", ""),
        user_template=data.get("user_template", "{abstract}"),
        fields=tuple(data["fields"]),
        default_values=dict(data.get("default_values", {})),
    )
    register_template(t)
    return t


register_template(MEDICAL)
register_template(CUSTOM)
