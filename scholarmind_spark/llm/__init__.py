from scholarmind_spark.llm.client import HTTPChatClient, MockLLMClient
from scholarmind_spark.llm.extract import llm_extract
from scholarmind_spark.llm.parse import parse_llm_response
from scholarmind_spark.llm.templates import (
    CUSTOM,
    MEDICAL,
    PromptTemplate,
    get_template,
    list_templates,
    load_template_yaml,
    register_template,
)

__all__ = [
    "HTTPChatClient",
    "MockLLMClient",
    "llm_extract",
    "parse_llm_response",
    "CUSTOM",
    "MEDICAL",
    "PromptTemplate",
    "get_template",
    "list_templates",
    "load_template_yaml",
    "register_template",
]
