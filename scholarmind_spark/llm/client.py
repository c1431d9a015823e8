"""LLM chat clients (reference U1 transport,
``src/api/llm_api.py:105-595``: vLLM / SiliconFlow / Ollama variants).

The engine ships one client per reference provider:
- :class:`MockLLMClient` — deterministic function of the prompt, used by
  tests and the correctness harness (no network).
- :class:`HTTPChatClient` — the vLLM variant: OpenAI-compatible
  ``/v1/chat/completions`` with the reference's retry/backoff discipline
  (3 retries, exponential 2^n backoff — llm_api.py:111,200).
- :class:`SiliconFlowChatClient` — 5 attempts, a distinct rate-limit
  (HTTP 429 / RateLimitError) branch, defaults-on-exhaustion
  (llm_api.py:305-360).
- :class:`OllamaChatClient` — Ollama's NATIVE ``{api_url}/chat`` endpoint
  (not the OpenAI shim): sampling under ``options``/``num_predict``,
  ``stream: false``, reply at ``message.content`` (llm_api.py:429-595).
All use stdlib urllib (no SDK dependency).

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
    """OpenAI-compatible chat client with retry + exponential backoff
    (the reference's vLLM variant, ``llm_api.py:105-300``).

    Transport seams (``_endpoint`` / ``_payload`` / ``_extract`` /
    ``_post``) exist so the provider subclasses below override only what
    actually differs in the reference — and so tests can substitute a fake
    transport without a network.  ``on_exhausted`` picks the contract when
    every attempt fails: ``"raise"`` (engine default — a broken endpoint
    should fail the job loudly) or ``"empty"`` (the reference's
    defaults-on-failure contract: return ``""``, which the D12 parse
    ladder downstream maps to the template's default values,
    ``llm_api.py:357-359,520-523``)."""

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
        on_exhausted: str = "raise",
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key or None  # '' in configs means "no key"
        self.max_retries = max_retries
        self.timeout_s = timeout_s
        self.temperature = temperature
        self.top_p = top_p
        self.max_tokens = max_tokens
        self.on_exhausted = on_exhausted
        self.rate_limit_hits = 0  # observability: 429/RateLimit retries taken

    # -- provider seams ----------------------------------------------------
    def _endpoint(self) -> str:
        return f"{self.base_url}/v1/chat/completions"

    def _payload(self, messages: list[dict[str, str]]) -> dict:
        payload = {"model": self.model, "messages": messages,
                   "temperature": self.temperature}
        # model_parameters pass-through (config_manager.py:82-95, llm_api.py)
        if self.top_p is not None:
            payload["top_p"] = self.top_p
        if self.max_tokens is not None:
            payload["max_tokens"] = self.max_tokens
        return payload

    def _extract(self, data: dict) -> str:
        return data["choices"][0]["message"]["content"]

    def _attempts(self) -> int:
        return self.max_retries + 1

    def _post(self, url: str, body: bytes, headers: dict[str, str]) -> bytes:
        import urllib.request

        req = urllib.request.Request(url, data=body, headers=headers)
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return resp.read()

    @staticmethod
    def _is_rate_limit(e: Exception) -> bool:
        """HTTP 429 — urllib surfaces it as HTTPError(code=429); also match
        SDK-style exceptions by class name (openai.RateLimitError) so a
        wrapped transport classifies identically."""
        return getattr(e, "code", None) == 429 or type(e).__name__ == "RateLimitError"

    # ----------------------------------------------------------------------
    def __call__(self, messages: list[dict[str, str]]) -> str:
        body = json.dumps(self._payload(messages)).encode()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        last_err: Exception | None = None
        attempts = self._attempts()
        for attempt in range(attempts):
            try:
                data = json.loads(self._post(self._endpoint(), body, headers).decode())
                return self._extract(data)
            except Exception as e:  # retry with 2^n backoff (llm_api.py:200)
                last_err = e
                if self._is_rate_limit(e):
                    self.rate_limit_hits += 1
                if attempt < attempts - 1:
                    time.sleep(2**attempt)
        if self.on_exhausted == "empty":
            return ""
        raise RuntimeError(
            f"LLM request failed after {attempts} attempts: {last_err}")


class SiliconFlowChatClient(HTTPChatClient):
    """SiliconFlow transport (``llm_api.py:305-360``): same OpenAI chat
    shape, but the reference's retry discipline differs from vLLM's —
    5 attempts (``while current_retry < self.max_retries`` with
    ``max_retries=5``), a distinct RateLimitError branch (warning + 2^n
    wait, counted here in ``rate_limit_hits``), and default values — not
    an exception — when attempts are exhausted."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("max_retries", 5)
        kwargs.setdefault("on_exhausted", "empty")
        super().__init__(*args, **kwargs)

    def _attempts(self) -> int:
        # reference counts ATTEMPTS against max_retries, not retries-after-
        # the-first: max_retries=5 → exactly 5 requests (llm_api.py:334)
        return self.max_retries


class OllamaChatClient(HTTPChatClient):
    """Ollama NATIVE transport (``llm_api.py:429-595``) — not the OpenAI
    shim: POST ``{api_url}/chat`` with sampling under ``options`` (Ollama's
    ``num_predict`` = max_tokens) and ``stream: false``; the reply lives at
    ``message.content``.  A structurally-invalid response returns ``""``
    (→ template defaults via the parse ladder), matching
    ``llm_api.py:516-523``; so does retry exhaustion."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("on_exhausted", "empty")
        super().__init__(*args, **kwargs)

    def _attempts(self) -> int:
        # reference Ollama loop is `for attempt in range(self.max_retries)`
        # (llm_api.py:505): exactly max_retries requests, same attempt
        # counting as SiliconFlow, NOT vLLM's retries-after-the-first
        return self.max_retries

    def _endpoint(self) -> str:
        return f"{self.base_url}/chat"

    def _payload(self, messages: list[dict[str, str]]) -> dict:
        options = {"temperature": self.temperature}
        if self.top_p is not None:
            options["top_p"] = self.top_p
        if self.max_tokens is not None:
            options["num_predict"] = self.max_tokens
        return {"model": self.model, "messages": messages,
                "options": options, "stream": False}

    def _extract(self, data: dict) -> str:
        message = data.get("message")
        if not isinstance(message, dict) or not isinstance(
            message.get("content"), str
        ):
            # invalid shape OR null content (some models emit it on
            # tool-call turns) → defaults immediately, no retry burn
            # (llm_api.py:520)
            return ""
        return message["content"].strip()
