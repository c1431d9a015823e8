"""LLM JSON-response parsing with fallbacks (reference D12,
``src/api/llm_api.py:23-86``).

Fallback ladder (each branch covered by tests):
1. strip ```json fences, try whole-text json.loads
2. first ``{...}`` block via regex, json.loads
3. per-field regex ``"field"\\s*:\\s*"([^"]+)"`` then the loose
   ``"field"\\s*:\\s*(.+?)(?:,|\\n|}})`` variant
4. ai_summary special case: non-JSON text >10 chars becomes the summary
5. anything still missing takes the template default
"""

from __future__ import annotations

import json
import re

from scholarmind_spark.llm.templates import PromptTemplate


def parse_llm_response(text: str | None, template: PromptTemplate) -> dict[str, str]:
    result = {f: template.default_for(f) for f in template.fields}
    if not text or not isinstance(text, str):
        return result

    cleaned = text.replace("```json", "").replace("```", "").strip()

    def absorb(data) -> bool:
        if isinstance(data, dict):
            for f in template.fields:
                if f in data:
                    v = data.get(f)
                    if v is None:
                        continue  # JSON null = missing → keep the default
                    result[f] = v if isinstance(v, str) else json.dumps(v, ensure_ascii=False)
            return True
        return False

    try:
        if absorb(json.loads(cleaned)):
            return result
    except (json.JSONDecodeError, ValueError):
        pass

    m = re.search(r"\{[\s\S]*\}", cleaned)
    if m:
        try:
            if absorb(json.loads(m.group(0))):
                return result
        except (json.JSONDecodeError, ValueError):
            pass

    for f in template.fields:
        m = re.search(rf'"{re.escape(f)}"\s*:\s*"([^"]+)"', cleaned)
        if m:
            result[f] = m.group(1)
            continue
        m = re.search(rf'"{re.escape(f)}"\s*:\s*(.+?)(?:,|\n|}})', cleaned)
        if m:
            result[f] = m.group(1).strip().strip('"').strip("'")

    if "ai_summary" in template.fields and result["ai_summary"] == template.default_for(
        "ai_summary"
    ):
        if not re.search(r"^\s*\{", cleaned) and len(cleaned) > 10:
            result["ai_summary"] = cleaned

    return result
