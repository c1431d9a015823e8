"""Sequence packing: concatenate documents into fixed-size training
sequences (engine extension — the step between a curated corpus and a
pretraining dataloader; the reference is a literature tool and stops at
Excel, SURVEY §2).

Pretraining consumes fixed-``context``-token sequences; feeding one short
document per sequence wastes the context as padding.  The standard fix
concatenates documents back-to-back and slices the token stream every
``context`` tokens, letting documents straddle sequence boundaries.

Spark-first shape:

- token counts are a per-row expression (``textstats.token_count`` — the
  same whitespace tokens the rest of the battery uses);
- documents are assigned to ``shards`` deterministic groups
  (``doc_id % shards``) and concatenated in ``doc_id`` order WITHIN each
  shard: the running-offset window partitions by shard, so the sort is
  per-shard and parallel — there is NO global-order window (a single
  task sorting the corpus at scale).  Per-shard packing is also what a
  multi-worker dataloader does — each worker owns its shards;
- every output column is integer arithmetic on the running offset, so
  the DuckDB oracle reproduces the packing exactly.

Scale posture: one shuffle on ``shard`` (pick ``shards`` ≈ a few × the
executor count), window state is a running sum — O(1) per row.  The
token stream itself is never materialized; downstream slicing joins the
pack coordinates back to the chunked text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scholarmind_spark.operators.textstats import token_count, token_count_sql


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    context_tokens: int = 512,
    shards: int = 8,
    token_counter=None,
) -> DataFrame:
    """Packing coordinates per document.

    Returns ``id_col, shard, n_tok, start_tok, seq_first, seq_last,
    offset_in_seq`` where ``start_tok`` is the document's first token
    offset in its shard's concatenated stream, ``seq_first``/``seq_last``
    the first/last ``context_tokens``-sized sequence it lands in, and
    ``offset_in_seq`` its offset within ``seq_first``.  Empty documents
    occupy zero tokens: they report the sequence where they would start
    (``seq_last = seq_first``).

    ``shards`` CAPS the job's parallelism: each shard's running-offset
    window is one sorted task, so the default 8 means 8 tasks sorting
    corpus/8 rows each — fine for gates, a multi-hour bottleneck at
    100 TB.  It cannot be auto-scaled because every output coordinate
    depends on it: choose it ONCE per dataset (≈ a few × the executor
    count, or the dataloader's worker count) and keep it fixed across
    incremental rebuilds.

    ``token_counter`` swaps the tokenizer (a ``Column -> Column`` giving
    an integer token count per text): default is the whitespace
    ``textstats.token_count``; pass ``operators.bpe.bpe_token_count``
    to budget by the pinned merge-table BPE — every packing coordinate
    downstream is tokenizer-agnostic integer arithmetic."""
    c = int(context_tokens)
    counter = token_count if token_counter is None else token_counter
    t = df.select(
        F.col(id_col),
        (F.col(id_col) % F.lit(shards)).cast("bigint").alias("shard"),
        counter(F.col(text_col)).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = t.withColumn("start_tok", (F.sum("n_tok").over(w) - F.col("n_tok")))
    return t.select(
        id_col,
        "shard",
        "n_tok",
        "start_tok",
        # integer div, NOT floor(double /): the double quotient loses ulps
        # past 2^53-ish offsets and could floor across an integer boundary
        # where the DuckDB twin's exact // does not
        F.expr(f"start_tok div {c}").alias("seq_first"),
        F.greatest(
            F.expr(f"start_tok div {c}"),
            F.expr(f"(start_tok + n_tok - 1) div {c}"),
        ).alias("seq_last"),
        (F.col("start_tok") % c).alias("offset_in_seq"),
    )


def pack_sequences_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    context_tokens: int = 512,
    shards: int = 8,
    token_counter_sql=None,
) -> str:
    """DuckDB twin of :func:`pack_sequences` (same shards, same order,
    same integer arithmetic; ``token_counter_sql`` mirrors
    ``token_counter`` — a ``str -> str`` SQL count builder)."""
    c = int(context_tokens)
    counter_sql = token_count_sql if token_counter_sql is None else token_counter_sql
    n_tok = counter_sql(text_col)
    return f"""
WITH t AS (
  SELECT {id_col},
         ({id_col} % {shards})::BIGINT AS shard,
         {n_tok}::BIGINT AS n_tok
  FROM {table}
),
o AS (
  -- ::BIGINT: DuckDB sum() over BIGINT yields HUGEINT (int128), which
  -- driver-side harnesses canonicalize differently than Spark's int64 —
  -- every derived column below must stay BIGINT end to end
  SELECT *,
         (sum(n_tok) OVER (PARTITION BY shard ORDER BY {id_col}
                           ROWS UNBOUNDED PRECEDING) - n_tok)::BIGINT AS start_tok
  FROM t
)
SELECT {id_col}, shard, n_tok, start_tok,
       (start_tok // {c})::BIGINT AS seq_first,
       greatest(start_tok // {c}, (start_tok + n_tok - 1) // {c})::BIGINT AS seq_last,
       (start_tok % {c})::BIGINT AS offset_in_seq
FROM o
"""


def pack_stats(packed: DataFrame, context_tokens: int = 512) -> DataFrame:
    """Per-shard packing summary: documents, tokens, sequences produced,
    and ``pad_fraction`` — the SHARD-WIDE fraction of padded positions,
    ``(n_sequences·context − total_tokens) / (n_sequences·context)``.
    All padding lives in the shard's final partial sequence, but the
    fraction is normalized over the whole shard (overall utilization =
    ``1 − pad_fraction``), not over that one sequence."""
    c = int(context_tokens)
    return (
        packed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .withColumn(
            "n_sequences", F.ceil(F.col("total_tokens") / c).cast("bigint")
        )
        .withColumn(
            "pad_fraction",
            F.round(
                (F.col("n_sequences") * c - F.col("total_tokens"))
                / (F.col("n_sequences") * c),
                6,
            ),
        )
        .orderBy("shard")
    )
