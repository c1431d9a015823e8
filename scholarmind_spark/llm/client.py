"""LLM chat clients (reference U1 transport,
``src/api/llm_api.py:105-595``: vLLM / SiliconFlow / Ollama variants).

The engine ships:
- :class:`MockLLMClient` — deterministic function of the prompt, used by
  tests and the correctness harness (no network).
- :class:`HTTPChatClient` — OpenAI-compatible ``/v1/chat/completions``
  endpoint with the reference's retry/backoff discipline (3 retries,
  exponential 2^n backoff — llm_api.py:111,200); gated behind an
  import-try so the engine has no hard network dependency.

Clients are plain picklable callables: ``client(messages) -> str``.  The
LLM map constructs one per executor partition.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass


@dataclass(frozen=True)
class MockLLMClient:
    """Deterministic mock: reply shape keyed by a stable hash of the user
    message, cycling through every D12 fallback branch so the parse ladder
    is exercised end-to-end (SURVEY §5 item 5)."""

    fields: tuple[str, ...]
    mode: str = "cycle"  # or "json" for always-clean JSON

    def __call__(self, messages: list[dict[str, str]]) -> str:
        user = next((m["content"] for m in messages if m["role"] == "user"), "")
        h = int(hashlib.md5(user.encode()).hexdigest()[:8], 16)
        payload = {
            f: f"{f}-{hashlib.md5((f + user).encode()).hexdigest()[:8]}"
            for f in self.fields
        }
        if self.mode == "json":
            return json.dumps(payload, ensure_ascii=False)
        branch = h % 6
        body = json.dumps(payload, ensure_ascii=False)
        if branch == 0:
            return f"```json\n{body}\n```"
        if branch == 1:
            return body
        if branch == 2:
            return f"Here is the analysis you asked for: {body} Hope it helps."
        if branch == 3:
            return "\n".join(f'"{f}": "{v}"' for f, v in payload.items())
        if branch == 4:
            return f"plain prose summary {hashlib.md5(user.encode()).hexdigest()[:12]}"
        return ""


class HTTPChatClient:
    """OpenAI-compatible chat client with retry + exponential backoff."""

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        max_retries: int = 3,
        timeout_s: float = 60.0,
        temperature: float = 0.1,
        top_p: float | None = None,
        max_tokens: int | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.max_retries = max_retries
        self.timeout_s = timeout_s
        self.temperature = temperature
        self.top_p = top_p
        self.max_tokens = max_tokens

    def __call__(self, messages: list[dict[str, str]]) -> str:
        import urllib.request

        payload = {"model": self.model, "messages": messages, "temperature": self.temperature}
        # model_parameters pass-through (config_manager.py:82-95, llm_api.py)
        if self.top_p is not None:
            payload["top_p"] = self.top_p
        if self.max_tokens is not None:
            payload["max_tokens"] = self.max_tokens
        body = json.dumps(payload).encode()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                req = urllib.request.Request(
                    f"{self.base_url}/v1/chat/completions", data=body, headers=headers
                )
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    data = json.loads(resp.read().decode())
                return data["choices"][0]["message"]["content"]
            except Exception as e:  # retry with 2^n backoff (llm_api.py:200)
                last_err = e
                if attempt < self.max_retries:
                    time.sleep(2**attempt)
        raise RuntimeError(f"LLM request failed after {self.max_retries + 1} attempts: {last_err}")
