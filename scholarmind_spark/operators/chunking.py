"""Document chunking: fixed-token windows with overlap — the standard
preparation step for sequence-model training and retrieval indexing.

Pure array expressions end-to-end (split → window starts via
``sequence`` → ``slice`` per start → ``posexplode``): no Python, no
shuffle — chunking is a flat projection that scales with the scan, and
the chunk rows inherit the parent's partitioning.  Chunk boundaries are
token-index arithmetic, so the DuckDB twin reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.textstats import tokens, tokens_sql


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
    tokenizer=None,
) -> DataFrame:
    """One row per (doc, window): ``id, chunk_id, n_tokens, chunk_text``.
    Windows start every ``chunk_tokens - overlap`` tokens; the final
    window may be shorter (it is kept — training pipelines pad, retrieval
    pipelines keep the tail context).

    A start is only emitted while the PREVIOUS window has not already
    reached the document end (sequence bound ``n - overlap - 1``):
    without that bound, any doc with ``step < n ≤ chunk_tokens`` got a
    final chunk that was a pure subset of the previous one — injecting
    exactly the duplicated text the dedup stages exist to remove.

    Tokenization defaults to :func:`textstats.tokens` — the SAME
    splitter the token counts and pack coordinates use, so chunk
    boundaries stay joinable with them.  ``tokenizer`` swaps it (a
    ``Column -> Column`` producing an array<string> of tokens): pass
    ``operators.bpe.bpe_tokens`` to chunk by the pinned merge-table
    BPE — window arithmetic is tokenizer-agnostic, and ``chunk_text``
    is then the space-joined token PIECES (chunk boundaries are token
    budgets; the pieces, not reflowed prose, are what a token-budgeted
    consumer sees)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    tok_fn = tokens if tokenizer is None else tokenizer
    toks = tok_fn(F.col(text_col))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - overlap - 1, F.lit(0)),
        F.lit(step),
    )
    ex = df.select(
        F.col(id_col).alias("id"),
        toks.alias("__toks"),
        F.explode(starts).alias("s"),
    )
    piece = F.slice(F.col("__toks"), F.col("s") + 1, chunk_tokens)
    # no terminal orderBy: a global sort of the rewritten corpus text is
    # a full extra shuffle for presentational row order no distributed
    # consumer can rely on (callers/gates order their own small outputs)
    return ex.select(
        "id",
        (F.col("s") / step).cast("bigint").alias("chunk_id"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
    tokenizer_sql=None,
) -> str:
    step = chunk_tokens - overlap
    tok_sql = tokens_sql if tokenizer_sql is None else tokenizer_sql
    toks = tok_sql(text_col)
    return f"""
WITH ex AS (
  SELECT {id_col} AS id, {toks} AS toks,
         unnest(generate_series(0, greatest(len({toks}) - {overlap} - 1, 0), {step})) AS s
  FROM {table}
)
SELECT id, (s / {step})::BIGINT AS chunk_id,
       len(toks[s + 1 : s + {chunk_tokens}]) AS n_tokens,
       array_to_string(toks[s + 1 : s + {chunk_tokens}], ' ') AS chunk_text
FROM ex ORDER BY id, chunk_id
"""
