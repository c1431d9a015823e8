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
    """Parse a YAML template document (reference prompt_templates.py:46-104).

    Field aliases follow the reference's YAMLPromptTemplate
    (prompt_templates.py:149-152): ``system``|``system_prompt`` and
    ``user_template``|``user_prompt``."""
    import yaml

    data = yaml.safe_load(text)
    fields = data["fields"]
    # validate BEFORE registering: a scalar string here (`fields: summary`,
    # the natural typo for a one-item list) would explode into
    # per-character columns via tuple(); non-string items would register
    # fine and crash later inside the Spark job's output schema
    if isinstance(fields, str) or not isinstance(fields, (list, tuple)):
        raise ValueError(
            f"template 'fields' must be a list of names, got {fields!r}"
        )
    if not fields or not all(isinstance(f, str) and f for f in fields):
        raise ValueError(
            f"template 'fields' must be non-empty strings, got {fields!r}"
        )
    t = PromptTemplate(
        type=data["type"],
        name=data.get("name", data["type"]),
        system=data.get("system", data.get("system_prompt", "")),
        user_template=data.get("user_template", data.get("user_prompt", "{abstract}")),
        fields=tuple(fields),
        default_values=dict(data.get("default_values", {})),
    )
    register_template(t)
    return t


def load_templates_dir(templates_dir: str) -> dict[str, PromptTemplate]:
    """Load every ``.yaml``/``.yml`` template in a directory into the
    registry, keyed by each template's ``type`` (reference
    ``YAMLPromptLoader.load_templates`` + ``load_yaml_templates``,
    prompt_templates.py:60-189).  Files without a ``type`` field are skipped
    with a warning, matching the reference; a missing directory returns an
    empty mapping rather than raising."""
    import os
    import warnings

    loaded: dict[str, PromptTemplate] = {}
    if not os.path.isdir(templates_dir):
        warnings.warn(f"prompt template directory not found: {templates_dir}")
        return loaded
    for filename in sorted(os.listdir(templates_dir)):
        if not filename.endswith((".yaml", ".yml")):
            continue
        path = os.path.join(templates_dir, filename)
        try:
            with open(path, encoding="utf-8") as f:
                t = load_template_yaml(f.read())
        except KeyError:
            warnings.warn(f"prompt template missing 'type' or 'fields': {filename}")
            continue
        except Exception as e:  # unparsable YAML — skip, like the reference
            warnings.warn(f"failed to load prompt template {filename}: {e}")
            continue
        loaded[t.type] = t
    return loaded


register_template(MEDICAL)
register_template(CUSTOM)
