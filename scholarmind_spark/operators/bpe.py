"""Byte-pair-encoding tokenizer: offline-trained merge table, JVM-side
greedy application.

Engine extension (the reference counts no tokens at all; the r8 battery
counted whitespace and regex pre-tokens — `textstats.token_count` /
`bpe_token_count`): a production training-data pipeline budgets, packs,
and chunks by REAL tokenizer tokens, and the dominant tokenizer family
is merge-table BPE (Sennrich et al. 2016; GPT-2/LLaMA vocabularies).
This module provides

- :func:`bpe_train` — the classic pair-count merge loop.  The word
  HISTOGRAM is computed distributed (one groupBy over the corpus); the
  merge loop itself runs driver-side over that histogram, which is the
  industry shape: vocabularies are trained on a bounded sample/vocab
  (the histogram is orders of magnitude smaller than the corpus — cap
  it with ``max_vocab`` for safety), then FROZEN and shipped to the
  fleet.  Training is not a per-query operation.
- :data:`PINNED_MERGES` — a merge table trained once by this function
  over the synthetic documents corpus and pinned as source, so the
  correctness gate has a deterministic artifact on both engines.
- :func:`bpe_token_count` / :func:`bpe_tokens` — application as a PURE
  JVM expression chain (and exact DuckDB twins).

Application algorithm — "greedy sequential rank-order application":
each word is pre-tokenized (``[a-z0-9]+`` runs of the lowercased text;
merges never cross word boundaries, the standard pre-tokenizer
contract), spelled as character tokens, then each merge ``(a, b) →
ab`` is applied IN TRAINING RANK ORDER as one leftmost-first
non-overlapping replace pass.  For a training-consistent table (every
merge's operands exist before it — which :func:`bpe_train` guarantees
by construction) this matches the reference iterative lowest-rank
encoder on real text; the subtle difference (an earlier-rank pair
formed only by a later-rank merge can no longer fire) cannot occur in
a table trained by this trainer's own bottom-up process on the same
pre-tokenization.  Sequential application is what makes the encoder a
STRAIGHT-LINE EXPRESSION: n_merges chained ``replace()`` calls —
whole-stage-codegen'd in Spark, byte-identical in DuckDB, no Python in
the hot path, no per-row loop, no UDF.

Token-boundary encoding: a word is spelled ``<c><h><a><r>`` — every
token wrapped in ``<``/``>``.  The pre-tokenizer alphabet is
``[a-z0-9]`` so the delimiters can never occur INSIDE a token, which
makes the merge replace ``<a><b> → <ab>`` unambiguous AND correct on
runs: replace's leftmost non-overlapping scan consumes whole-token
units (``<a><a><a><a>`` → ``<aa><aa>``, never a half-token match).

Scale — two application tiers:

- **Expression chain** (:func:`bpe_tokens`): a per-row expression over
  a constant merge table folded into the PLAN (a 40-merge table is
  ~1 KB of literals); cost is O(n_merges · word_len) string scanning
  per row, all codegen.  The right tier for small pinned tables.
- **Arrow-batched** (:func:`bpe_tokens_batched`): for vocabulary-scale
  tables (1k–50k merges) where n_merges chained replaces would scan
  every row n_merges times, a ``mapInPandas`` encoder with a
  driver-BROADCAST rank dict and a per-task word→tokens MEMO cache.
  Cost per row is O(word pairs · merges-that-fire) dict lookups —
  independent of table size — and the Zipfian word distribution makes
  the memo hit rate ≈ 1 on real text, so steady-state cost is one
  dict probe per word.  This is the production tokenizer shape
  (HuggingFace ``tokenizers``' cache does exactly this).  It
  implements the REFERENCE iterative lowest-rank algorithm; for
  training-consistent tables that equals the sequential encoder
  (property-tested in ``tests/test_bpe.py``), and the
  ``text_bpe_tokens_large`` gate pins tier equality row-by-row on the
  pinned table against the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the pre-tokenizer: maximal runs of lowercase alphanumerics over the
# lowercased text.  Merges never cross these word boundaries.
WORD_RE = "[a-z0-9]+"


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 40,
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train a merge table: distributed word histogram, driver-side
    merge loop (Sennrich et al. 2016, algorithm 1).

    Deterministic: pair selection breaks count ties lexicographically,
    so the same corpus always yields the same table.  ``max_vocab``
    bounds the driver collect (take the most frequent words — rare-tail
    truncation is standard practice and only perturbs low-count pairs).
    """
    words = (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_vocab)
    )
    hist = {r["w"]: r["c"] for r in words.collect()}
    # word → tuple of current tokens (chars initially)
    spelt: dict[str, tuple[str, ...]] = {w: tuple(w) for w in hist}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, toks in spelt.items():
            c = hist[w]
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        # deterministic tiebreak: highest count, then lexicographically
        # smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, toks in spelt.items():
            if a not in toks:
                continue
            out: list[str] = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            spelt[w] = tuple(out)
    return merges


# Trained ONCE by bpe_train(documents @ sf0.01, n_merges=40) and pinned
# (tools/train_bpe.py regenerates).  Pinning makes the tokenizer a fixed
# artifact — the same contract as a production tokenizer.json: the gate,
# the bench, and the DuckDB twin all consume this exact table.
PINNED_MERGES: list[tuple[str, str]] = [
    ('e', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('o', 'r'),
    ('s', 't'),
    ('m', 'er'),
    ('a', 't'),
    ('l', 'u'),
    ('a', 'r'),
    ('p', 'ar'),
    ('j', 'o'),
    ('jo', 'in'),
    ('a', 's'),
    ('as', 'h'),
    ('h', 'ash'),
    ('r', 'ow'),
    ('at', 'c'),
    ('atc', 'h'),
    ('b', 'atch'),
    ('a', 'n'),
    ('c', 'an'),
    ('s', 'can'),
    ('c', 'o'),
    ('c', 'u'),
    ('co', 'lu'),
    ('colu', 'm'),
    ('colum', 'n'),
    ('cu', 'st'),
    ('cust', 'o'),
    ('custo', 'mer'),
    ('f', 'i'),
    ('fi', 'l'),
    ('fil', 't'),
    ('filt', 'er'),
    ('a', 'l'),
    ('al', 'l'),
    ('m', 'all'),
    ('s', 'mall'),
    ('g', 'e'),
    ('l', 'ow'),
]


def _charify(word: Column) -> Column:
    """``word`` → ``<c><h><a><r>`` (every char wrapped as a token)."""
    return F.regexp_replace(word, "(.)", "<$1>")


def _apply_merges(seq: Column, merges: list[tuple[str, str]]) -> Column:
    """Chained leftmost-first replace passes, one per merge, rank order."""
    for a, b in merges:
        seq = F.replace(seq, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
    return seq


def _words(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(WORD_RE), F.lit(0))


def bpe_word_seqs(col: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """array<string> of per-word encoded sequences (``<to><ken>`` form)."""
    merges = PINNED_MERGES if merges is None else merges
    return F.transform(_words(col), lambda w: _apply_merges(_charify(w), merges))


def bpe_tokens(col: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """array<string> of BPE tokens of the whole text (word-internal
    pieces, word boundaries implicit — the id-stream view packing and
    chunking consume)."""
    seqs = bpe_word_seqs(col, merges)
    return F.flatten(
        F.transform(
            seqs,
            lambda s: F.split(F.regexp_replace(s, "^<|>$", ""), "><"),
        )
    )


def bpe_token_count(col: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """bigint BPE token count: per-word ``count('<')`` summed — cheaper
    than materializing the token array (no split/flatten)."""
    seqs = bpe_word_seqs(col, merges)
    per_word = F.transform(
        seqs, lambda s: F.length(s) - F.length(F.replace(s, F.lit("<")))
    )
    return F.coalesce(
        F.aggregate(per_word, F.lit(0).cast("bigint"), lambda acc, x: acc + x),
        F.lit(0).cast("bigint"),
    )


# ----------------------------------------- large-vocabulary Arrow tier


def _encode_word_iterative(
    word: str, ranks: dict[tuple[str, str], int], merges: list[tuple[str, str]]
) -> list[str]:
    """Reference iterative lowest-rank BPE encode of one pre-token
    (Sennrich/GPT-2 shape): repeatedly merge ALL occurrences of the
    lowest-rank adjacent pair present until none remains."""
    toks: list[str] = list(word)
    while len(toks) > 1:
        best = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = merges[best]
        ab = a + b
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


# memo entries are tiny (a word + its pieces); 2M entries ≈ low hundreds
# of MB — clear past the cap so a pathological high-cardinality corpus
# (random strings) cannot grow a task's heap without bound
_MEMO_CAP = 2_000_000

# one broadcast per (application, merge table): a long-lived session
# that calls bpe_tokens_batched in a loop (the bench harness does) must
# not accumulate one driver+executor copy of the merge table per call.
# Keyed by applicationId so a restarted SparkContext never reuses a
# dead broadcast; stale-application entries are unpersisted on miss.
# LRU-capped per application (insertion order IS recency — hits are
# re-inserted): a session that tokenizes with MANY distinct trained
# tables would otherwise pin one never-unpersisted broadcast per table
# for the application's whole life — a slow driver+executor leak.
_BCAST_CACHE: dict = {}
_BCAST_CAP = 8  # live broadcasts per application (~5 MB each at 50k merges)


def _unpersist_quietly(b) -> None:
    try:
        b.unpersist()
    except Exception:
        pass  # context already gone — nothing to release


def _merge_broadcast(sc, ranks: dict, merges: list):
    key = (sc.applicationId, hash(tuple(merges)))
    hit = _BCAST_CACHE.get(key)
    # hash collisions are astronomically unlikely but cheap to rule
    # out: verify the cached table really is this table
    if hit is not None and hit[0] == merges:
        _BCAST_CACHE[key] = _BCAST_CACHE.pop(key)  # LRU touch
        return hit[1]
    if hit is not None:
        # collision fallthrough: the displaced broadcast would be
        # silently overwritten below — release it first
        _BCAST_CACHE.pop(key)
        _unpersist_quietly(hit[1])
    for old_key in list(_BCAST_CACHE):
        if old_key[0] != sc.applicationId:
            _unpersist_quietly(_BCAST_CACHE.pop(old_key)[1])
    same_app = [k for k in _BCAST_CACHE if k[0] == sc.applicationId]
    while len(same_app) >= _BCAST_CAP:
        _unpersist_quietly(_BCAST_CACHE.pop(same_app.pop(0))[1])
    b = sc.broadcast((ranks, merges))
    _BCAST_CACHE[key] = (merges, b)
    return b


def bpe_tokens_batched(
    df: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """All input columns plus ``out_col: array<string>`` — the BPE
    tokens of ``text_col``, encoded by the Arrow-batched large-vocab
    tier (module docstring).  NULL text → NULL array, no-word text →
    empty array — exactly the expression tier's semantics.

    The merge table ships ONCE per executor as a Spark broadcast (a
    50k-merge dict is ~5 MB — closure pickling would resend it per
    task), and the broadcast itself is memoized per (application,
    merge-table) in ``_BCAST_CACHE`` so repeated calls in a long-lived
    session reuse one copy instead of leaking one per call; the
    word→pieces memo is per task, capped at ``_MEMO_CAP``."""
    import re

    from pyspark.sql.types import ArrayType, StringType, StructType

    merges = PINNED_MERGES if merges is None else list(merges)
    ranks = {pair: i for i, pair in enumerate(merges)}
    b_table = _merge_broadcast(df.sparkSession.sparkContext, ranks, merges)
    schema = StructType(df.schema.fields[:]).add(
        out_col, ArrayType(StringType()), True
    )
    word_re = re.compile(WORD_RE)

    def run(batches):
        rk, mg = b_table.value
        memo: dict[str, list[str]] = {}

        def encode_text(t):
            if t is None:
                return None
            toks: list[str] = []
            for w in word_re.findall(t.lower()):
                hit = memo.get(w)
                if hit is None:
                    if len(memo) >= _MEMO_CAP:
                        memo.clear()
                    hit = memo[w] = _encode_word_iterative(w, rk, mg)
                toks.extend(hit)
            return toks

        for pdf in batches:
            yield pdf.assign(**{out_col: [encode_text(t) for t in pdf[text_col]]})

    return df.mapInPandas(run, schema)


# ------------------------------------------------------------ SQL twins


def _apply_merges_sql(seq: str, merges: list[tuple[str, str]]) -> str:
    for a, b in merges:
        seq = f"replace({seq}, '<{a}><{b}>', '<{a}{b}>')"
    return seq


def _words_sql(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{WORD_RE}')"


def bpe_word_seqs_sql(expr: str, merges: list[tuple[str, str]] | None = None) -> str:
    merges = PINNED_MERGES if merges is None else merges
    inner = _apply_merges_sql(r"regexp_replace(w, '(.)', '<\1>', 'g')", merges)
    return f"list_transform({_words_sql(expr)}, w -> {inner})"


def bpe_tokens_sql(expr: str, merges: list[tuple[str, str]] | None = None) -> str:
    seqs = bpe_word_seqs_sql(expr, merges)
    return (
        f"flatten(list_transform({seqs},"
        f" s -> string_split(regexp_replace(s, '^<|>$', '', 'g'), '><')))"
    )


def bpe_token_count_sql(expr: str, merges: list[tuple[str, str]] | None = None) -> str:
    seqs = bpe_word_seqs_sql(expr, merges)
    return (
        f"coalesce(list_aggregate(list_transform({seqs},"
        f" s -> length(s) - length(replace(s, '<', ''))), 'sum'), 0)::BIGINT"
    )
