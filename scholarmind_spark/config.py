"""YAML/JSON config lifecycle (reference K3,
``src/config/config_manager.py:7-177``, consumed at ``main.py:447``).

``load_config`` reads a YAML or JSON file (by extension, YAML for
``.yaml``/``.yml``, JSON otherwise — config_manager.py:34-41) and deep-merges
the reference's defaults: every section the reference back-fills
(``journal_metrics``, ``llm`` with per-provider endpoints/models/limits,
``model_parameters``, ``processing``, ``prompt``) is back-filled here with the
same values, so a user's reference-style ``config.yaml`` drives this engine
unchanged.  Divergences from the reference, both deliberate:

- missing/broken files raise :class:`ConfigError` instead of ``sys.exit``
  (library code must not kill the driver JVM's host process); the CLI maps
  the exception to exit status 2.
- a missing ``siliconflow_api_key`` with ``type: siliconflow`` raises only
  when the LLM stage is enabled (the reference exits even when disabled).
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any


class ConfigError(ValueError):
    """Config file missing or unparsable (reference sys.exit paths)."""


# Defaults mirroring config_manager.py:47-170 — one literal tree instead of
# the reference's if-chain; _merge_defaults back-fills missing keys at any
# depth without overwriting user values.
CONFIG_DEFAULTS: dict[str, Any] = {
    "journal_metrics": {
        "enabled": True,
        "metrics_to_fetch": [],
        "metrics_column_mapping": {},
    },
    "llm": {
        "enabled": False,
        "type": "vllm",
        "model_parameters": {"temperature": 0.7, "top_p": 0.9, "max_tokens": 4096},
        "vllm_api_url": "http://localhost:8000/v1/completions",
        "vllm_api_key": "",
        "vllm_model": "qwen",
        "siliconflow_api_key": "",
        "siliconflow_base_url": "https://api.siliconflow.cn/v1",
        "siliconflow_model": "deepseek-ai/DeepSeek-V3",
        "siliconflow_rpm": 3000,
        "siliconflow_tpm": 200000,
        "ollama_api_url": "http://localhost:11434/api",
        "ollama_model": "llama3",
        "ollama_api_key": "",
    },
    "processing": {"disable_summary": False, "batch_size": 16, "max_workers": 4},
    "prompt": {"default_type": "medical", "templates_dir": "config/prompts"},
}


def _merge_defaults(config: dict, defaults: dict) -> dict:
    for key, dval in defaults.items():
        if key not in config:
            config[key] = copy.deepcopy(dval)
        elif isinstance(config[key], dict) and isinstance(dval, dict):
            _merge_defaults(config[key], dval)
    return config


def apply_defaults(config: dict) -> dict:
    """Back-fill the reference's defaults (config_manager.py:47-170) and
    validate provider requirements.  Mutates and returns ``config``."""
    _merge_defaults(config, CONFIG_DEFAULTS)
    llm = config["llm"]
    llm["type"] = str(llm["type"]).lower()
    if (
        llm["enabled"]
        and llm["type"] == "siliconflow"
        and not llm["siliconflow_api_key"]
    ):
        # config_manager.py:111-113 exits unconditionally; scoped to enabled
        raise ConfigError("llm.type=siliconflow requires llm.siliconflow_api_key")
    return config


def load_config(config_path: str | None = None) -> dict:
    """Load + default-merge a config file (config_manager.py:7-45).

    ``None`` falls back to ``config.yaml`` next to this module, matching the
    reference's package-relative default path."""
    if config_path is None:
        config_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "config.yaml")
        if not os.path.exists(config_path):
            raise ConfigError(f"no config file found (default path {config_path})")
    if not os.path.exists(config_path):
        raise ConfigError(f"config file not found: {config_path}")

    ext = os.path.splitext(config_path)[1].lower()
    try:
        with open(config_path, encoding="utf-8") as f:
            if ext in (".yaml", ".yml"):
                import yaml

                config = yaml.safe_load(f)
            else:  # reference treats everything else as JSON
                config = json.load(f)
    except Exception as e:  # OSError / yaml.YAMLError / json.JSONDecodeError
        raise ConfigError(f"failed to load config file {config_path}: {e}") from e
    if not isinstance(config, dict):
        raise ConfigError("config root must be a mapping")
    return apply_defaults(config)


def make_llm_client(config: dict, fields: tuple[str, ...] = ()):
    """Build the chat client the config selects, or ``None`` when the LLM
    stage is disabled (main.py:471-487 wiring).

    Provider mapping mirrors the reference's three client classes
    (``llm_api.py``): ``vllm`` → the OpenAI-compatible
    :class:`HTTPChatClient` (3 retries, raise on exhaustion), ``siliconflow``
    → :class:`SiliconFlowChatClient` (5 attempts, rate-limit-aware,
    defaults on exhaustion), ``ollama`` → :class:`OllamaChatClient`
    (native ``/chat`` endpoint + ``options`` payload).  ``type: mock``
    (engine extension) yields the deterministic mock (which needs the
    template's ``fields`` to fabricate replies) for offline runs."""
    llm = config["llm"]
    if not llm["enabled"]:
        return None
    params = llm["model_parameters"]
    if llm["type"] == "mock":
        from scholarmind_spark.llm.client import MockLLMClient

        return MockLLMClient(fields=fields, mode="json")
    from scholarmind_spark.llm.client import (
        HTTPChatClient,
        OllamaChatClient,
        SiliconFlowChatClient,
    )

    cls, url, key, model = {
        "vllm": (HTTPChatClient, "vllm_api_url", "vllm_api_key", "vllm_model"),
        "siliconflow": (SiliconFlowChatClient, "siliconflow_base_url",
                        "siliconflow_api_key", "siliconflow_model"),
        "ollama": (OllamaChatClient, "ollama_api_url", "ollama_api_key",
                   "ollama_model"),
    }.get(llm["type"], (HTTPChatClient, "vllm_api_url", "vllm_api_key", "vllm_model"))
    return cls(
        base_url=llm[url],
        api_key=llm[key],
        model=llm[model],
        temperature=params["temperature"],
        top_p=params["top_p"],
        max_tokens=params["max_tokens"],
    )


def pipeline_config_from(config: dict, spark=None, sources: dict[str, str] | None = None):
    """Translate a loaded config dict into a :class:`PipelineConfig`
    (the engine analogue of main.py:447-505's config consumption).

    ``sources`` overrides/extends the config's ``sources:`` section (the
    reference passes file paths separately from config).  ``spark`` is needed
    only when the config names a ``journal_metrics.lookup_parquet`` table.
    """
    from scholarmind_spark.pipeline import PipelineConfig

    cfg_sources = dict(config.get("sources") or {})
    if sources:
        cfg_sources.update(sources)

    metrics_df = fetch_one = None
    jm = config["journal_metrics"]
    lookup = jm.get("lookup_parquet")
    if jm["enabled"] and lookup:
        if spark is None:
            raise ConfigError("journal_metrics.lookup_parquet requires a SparkSession")
        metrics_df = spark.read.parquet(lookup)
    elif jm["enabled"] and config.get("easyscholar_api_key") and jm["metrics_to_fetch"]:
        # online per-journal fetch with the reference's rank semantics
        from scholarmind_spark.metrics_client import make_fetch_one

        fetch_one = make_fetch_one(
            config["easyscholar_api_key"],
            jm["metrics_to_fetch"],
            jm["metrics_column_mapping"] or None,
        )

    template = client = None
    if config["llm"]["enabled"]:
        from scholarmind_spark.llm.templates import get_template, load_templates_dir

        prompt = config["prompt"]
        if os.path.isdir(prompt["templates_dir"]):
            load_templates_dir(prompt["templates_dir"])
        template = get_template(prompt["default_type"])
        client = make_llm_client(config, fields=tuple(template.fields))

    return PipelineConfig(
        sources=cfg_sources,
        metrics_df=metrics_df,
        metrics_fetch_one=fetch_one,
        llm_template=template,
        llm_client=client,
        llm_max_workers=config["processing"]["max_workers"],
    )
