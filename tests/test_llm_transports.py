"""Provider-parity LLM transports (reference ``src/api/llm_api.py``):
vLLM/OpenAI-compatible (:105-300), SiliconFlow's 5-attempt rate-limit-aware
retry (:305-360), and Ollama's native ``/chat`` endpoint (:429-595).

All tests run against a fake ``_post`` transport — no network, no sleeps
(backoff is monkeypatched to record instead of wait)."""

from __future__ import annotations

import json
import urllib.error

import pytest

from scholarmind_spark.llm.client import (
    HTTPChatClient,
    OllamaChatClient,
    SiliconFlowChatClient,
)

MESSAGES = [{"role": "system", "content": "s"}, {"role": "user", "content": "u"}]


def _openai_reply(text: str) -> bytes:
    return json.dumps({"choices": [{"message": {"content": text}}]}).encode()


def _http_error(code: int) -> urllib.error.HTTPError:
    return urllib.error.HTTPError("http://x", code, "err", hdrs=None, fp=None)


class Transport:
    """Scripted fake: pops one outcome per request; Exception → raise."""

    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.requests: list[tuple[str, dict, dict]] = []

    def __call__(self, client, url, body, headers):
        self.requests.append((url, json.loads(body.decode()), dict(headers)))
        out = self.outcomes.pop(0)
        if isinstance(out, Exception):
            raise out
        return out


def _wire(client, transport, monkeypatch):
    monkeypatch.setattr(type(client), "_post",
                        lambda self, u, b, h: transport(self, u, b, h))
    slept = []
    monkeypatch.setattr("scholarmind_spark.llm.client.time",
                        type("T", (), {"sleep": staticmethod(slept.append)}))
    return slept


def test_openai_payload_endpoint_and_auth(monkeypatch):
    c = HTTPChatClient("http://h:8000/", "m1", api_key="k",
                       temperature=0.2, top_p=0.9, max_tokens=64)
    t = Transport([_openai_reply("ok")])
    _wire(c, t, monkeypatch)
    assert c(MESSAGES) == "ok"
    url, payload, headers = t.requests[0]
    assert url == "http://h:8000/v1/chat/completions"
    assert payload == {"model": "m1", "messages": MESSAGES,
                       "temperature": 0.2, "top_p": 0.9, "max_tokens": 64}
    assert headers["Authorization"] == "Bearer k"


def test_openai_retry_then_raise(monkeypatch):
    c = HTTPChatClient("http://h", "m", max_retries=3)
    t = Transport([_http_error(500)] * 4)
    slept = _wire(c, t, monkeypatch)
    with pytest.raises(RuntimeError, match="after 4 attempts"):
        c(MESSAGES)
    assert len(t.requests) == 4  # 3 retries = 4 attempts (llm_api.py:111)
    assert slept == [1, 2, 4]  # 2^n backoff, no sleep after the last


def test_siliconflow_rate_limit_branch(monkeypatch):
    """Two 429s then success: the rate-limit branch retries with 2^n waits
    and the hits are counted distinctly (llm_api.py:347-352)."""
    c = SiliconFlowChatClient("http://sf", "deepseek", api_key="k")
    t = Transport([_http_error(429), _http_error(429), _openai_reply("fine")])
    slept = _wire(c, t, monkeypatch)
    assert c(MESSAGES) == "fine"
    assert c.rate_limit_hits == 2
    assert slept == [1, 2]


def test_siliconflow_five_attempts_then_defaults(monkeypatch):
    """Exhaustion = exactly 5 requests (while current_retry < max_retries,
    max_retries=5 — llm_api.py:334) and a DEFAULTS contract, not an
    exception (llm_api.py:357-359): '' feeds the D12 parse ladder which
    yields the template's default values."""
    c = SiliconFlowChatClient("http://sf", "m", api_key="k")
    t = Transport([_http_error(429)] * 5)
    _wire(c, t, monkeypatch)
    assert c(MESSAGES) == ""
    assert len(t.requests) == 5
    assert c.rate_limit_hits == 5


def test_ollama_native_endpoint_and_payload(monkeypatch):
    c = OllamaChatClient("http://localhost:11434/api", "llama3",
                         temperature=0.7, top_p=0.9, max_tokens=4096)
    reply = json.dumps({"message": {"role": "assistant",
                                    "content": "  answer  "}}).encode()
    t = Transport([reply])
    _wire(c, t, monkeypatch)
    assert c(MESSAGES) == "answer"  # stripped (llm_api.py:517)
    url, payload, headers = t.requests[0]
    assert url == "http://localhost:11434/api/chat"  # native, not /v1/...
    assert payload == {
        "model": "llama3",
        "messages": MESSAGES,
        "options": {"temperature": 0.7, "top_p": 0.9, "num_predict": 4096},
        "stream": False,
    }
    assert "Authorization" not in headers  # empty key → no auth header


def test_ollama_invalid_shape_and_exhaustion_return_defaults(monkeypatch):
    c = OllamaChatClient("http://o/api", "m", max_retries=1)
    # structurally invalid response → '' immediately (llm_api.py:520-523)
    t = Transport([json.dumps({"done": True}).encode()])
    _wire(c, t, monkeypatch)
    assert c(MESSAGES) == ""

    c2 = OllamaChatClient("http://o/api", "m", max_retries=2)
    t2 = Transport([_http_error(500), _http_error(500), _http_error(500)])
    _wire(c2, t2, monkeypatch)
    assert c2(MESSAGES) == ""  # defaults contract on exhaustion
    # reference counts ATTEMPTS against max_retries (llm_api.py:505
    # `for attempt in range(self.max_retries)`): exactly 2 requests,
    # not vLLM's retries-after-the-first 3
    assert len(t2.requests) == 2


def test_config_dispatch_builds_provider_clients():
    from scholarmind_spark.config import apply_defaults, make_llm_client

    def cfg(type_, **extra):
        llm = {"enabled": True, "type": type_,
               "siliconflow_api_key": "sk" if type_ == "siliconflow" else ""}
        llm.update(extra)
        return apply_defaults({"llm": llm})

    c = make_llm_client(cfg("siliconflow"))
    assert isinstance(c, SiliconFlowChatClient)
    assert c.max_retries == 5 and c.on_exhausted == "empty"
    assert c.base_url == "https://api.siliconflow.cn/v1"

    c = make_llm_client(cfg("ollama"))
    assert isinstance(c, OllamaChatClient)
    assert c._endpoint().endswith("/api/chat")
    assert c.api_key is None  # '' key → no auth header

    c = make_llm_client(cfg("vllm"))
    assert type(c) is HTTPChatClient and c.on_exhausted == "raise"


def test_clients_are_picklable():
    """mapInPandas ships the client factory to executors — must pickle."""
    import pickle

    for c in (HTTPChatClient("http://h", "m", api_key="k"),
              SiliconFlowChatClient("http://s", "m"),
              OllamaChatClient("http://o/api", "m")):
        c2 = pickle.loads(pickle.dumps(c))
        assert c2.base_url == c.base_url and c2.model == c.model
        assert c2._endpoint() == c._endpoint()


def test_ollama_null_content_returns_defaults_without_retry(monkeypatch):
    """content: null (tool-call turns) is a shape problem, not a transport
    failure — '' immediately, no retry burn."""
    c = OllamaChatClient("http://o/api", "m", max_retries=3)
    t = Transport([json.dumps({"message": {"role": "assistant",
                                           "content": None}}).encode()])
    slept = _wire(c, t, monkeypatch)
    assert c(MESSAGES) == ""
    assert len(t.requests) == 1 and slept == []
