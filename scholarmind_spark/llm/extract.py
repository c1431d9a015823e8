"""The LLM abstract-understanding map (reference U1,
``src/api/llm_api.py:105-268`` + invocation ``main.py:308-350``).

Spark-first design (fixes reference J2, the positional re-alignment at
``main.py:331-335``):

- ``mapInPandas`` over Arrow batches; output rows carry the INPUT KEY plus
  the N template fields, so results attach by key, never by position.
- One client per partition, bounded in-partition thread fan-out
  (``max_workers``, reference default 4 — config.yaml:78) — partition-level
  parallelism × in-partition concurrency replaces the reference's single
  ThreadPool.
- Retries/backoff live INSIDE the client (Spark task retries would re-call
  the LLM for a whole partition — SURVEY §4).
- The mock client makes the operator deterministic for tests/oracle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from scholarmind_spark.llm.parse import parse_llm_response
from scholarmind_spark.llm.templates import PromptTemplate

ChatClient = Callable[[list[dict[str, str]]], str]


def llm_extract(
    df: DataFrame,
    template: PromptTemplate,
    client: ChatClient,
    key_col: str = "record_id",
    text_col: str = "abstract",
    max_workers: int = 4,
) -> DataFrame:
    """df + N template-defined string columns, joined by key.

    Rows with null ``text_col`` get pure defaults without an LLM call
    (the reference iterates only extracted abstracts, main.py:313-315).
    """
    out_schema = StructType(
        df.select(key_col).schema.fields + template.output_schema().fields
    )
    fields = template.fields

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        def one(abstract) -> dict[str, str]:
            if abstract is None or (isinstance(abstract, float) and pd.isna(abstract)):
                return {f: template.default_for(f) for f in fields}
            reply = client(template.messages(str(abstract)))
            return parse_llm_response(reply, template)

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for pdf in batches:
                results = list(pool.map(one, pdf[text_col]))
                out = {key_col: pdf[key_col].values}
                for f in fields:
                    out[f] = [r[f] for r in results]
                yield pd.DataFrame(out, columns=[key_col, *fields], dtype=object)

    # ONE LLM call and ONE ai row per key: byte-identical records share a
    # content-addressed record_id by design (sources/base.stable_record_id),
    # so without the dropDuplicates N duplicate keys would fan the left
    # join out to N×N rows AND burn N redundant LLM calls per duplicate
    ai = (
        df.select(key_col, text_col)
        .dropDuplicates([key_col])
        .mapInPandas(run, schema=out_schema)
    )
    return df.join(ai, on=key_col, how="left")
