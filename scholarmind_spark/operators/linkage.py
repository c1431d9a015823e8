"""Segment-blocked fuzzy record linkage (edit-distance entity resolution).

Engine extension (SURVEY §2 — the reference normalizes journal keys
with exact lower/trim matching, src/core/data_processor.py D11; this
is the approximate companion): find string pairs within a small edit
distance without an all-pairs comparison.  Training-data uses: typo
/ variant detection across metadata keys (journal names, author
spellings, domain names), and query-side vocabulary correction.

Semantics (LOSSLESS, identical in the DuckDB oracle): emit ``a, b,
dist`` with ``a < b`` for all distinct non-empty keys where

    levenshtein(a, b) <= max_dist

Candidate generation is PassJoin-style segment blocking (Li, Deng,
Wang & Feng, "PassJoin: a partition-based method for similarity joins",
PVLDB 2011): every key of length ``n > max_dist`` is split into
``max_dist + 1`` contiguous segments (a pure function of ``n``); by
pigeonhole, ``max_dist`` edits leave at least one segment UNTOUCHED, so
a qualifying pair must agree on one segment string at a position shift
of at most ``max_dist``.  The probe side therefore enumerates, per key,
each partner length within ±``max_dist``, each segment index, and each
shift in ±``max_dist`` — a CONSTANT ~(2d+1)²(d+1) ≈ 75 probe rows per
key at d = 2 — and the join key is the SEGMENT STRING itself.

Why this scales where char-anchor blocking did not: an anchor scheme
(first/last char × length) has O(alphabet × max-length) buckets — a
constant independent of data size, so bucket SIZES grow linearly and
the self-join quadratically.  Segment strings are high-cardinality and
data-dependent: bucket sizes track how often a ~n/3-char substring
repeats across keys, which for real vocabularies keeps the join
near-linear.  Keys of length ≤ ``max_dist`` cannot guarantee a
non-empty untouched segment; they pair against the (alphabet-bounded)
set of keys of length ≤ 2·``max_dist`` directly.

The exact ``levenshtein`` (Spark built-in, code-point semantics) runs
only on candidates; verified pairs are deduplicated on the oriented
(a, b) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments_expr(n_col: str, d: int) -> str:
    """SQL expr: array<struct<i,start,len>> — the pinned even-partition
    scheme for a string of length ``n_col`` into ``d + 1`` segments
    (short segments first, remainder distributed to the tail; start/len
    are pure integer functions of n)."""
    m = d + 1
    return (
        f"transform(sequence(0, {d}), i -> named_struct("
        f"'i', i, "
        f"'start', i * ({n_col} div {m}) + greatest(0, i - ({m} - {n_col} % {m})), "
        f"'len', ({n_col} div {m}) + (CASE WHEN i >= {m} - {n_col} % {m} THEN 1 ELSE 0 END)))"
    )


def fuzzy_link(
    df: DataFrame, key_col: str, max_dist: int = 2
) -> DataFrame:
    """``a, b, dist`` lossless fuzzy self-linkage of the distinct values
    of ``key_col``: every pair within ``max_dist`` edits, no all-pairs
    comparison (PassJoin segment blocking — see module docstring)."""
    from scholarmind_spark.util import attach_caches

    cand, caches = _passjoin_candidates(df, key_col, max_dist)
    out = cand.select(
        "a", "b", F.levenshtein("a", "b").alias("dist")
    ).filter(F.col("dist") <= max_dist)
    return attach_caches(out, caches)


def _passjoin_candidates(
    df: DataFrame, key_col: str, max_dist: int, dedup: bool = True
) -> tuple[DataFrame, list[DataFrame]]:
    """The PassJoin blocking stage alone: distinct ``(a, b)`` candidate
    pairs (``a < b``, superset of all true ≤ max_dist pairs), plus the
    persist()-ed relations the plan holds — so multi-pass composition
    (:func:`link_candidates`) can union candidates across blockers and
    verify ONCE.

    ``dedup=False`` skips the trailing ``.distinct()`` — a full exchange
    of the candidate set — for callers that deduplicate downstream
    anyway (:func:`link_candidates` groupBys on the pair to merge
    provenance flags, making the inner distinct a second shuffle of the
    same keys; guide §2.4).  Direct verifiers (:func:`fuzzy_link`) must
    keep it or they would emit duplicate verified rows."""
    d = max_dist
    # persist(): four consumers (idx, probes, tiny, small) — uncached,
    # each re-runs the input scan AND the distinct shuffle.  Two narrow
    # columns over distinct keys only, disk-spillable; tagged on the
    # output via attach_caches.
    keys = (
        df.select(F.col(key_col).cast("string").alias("k"))
        .filter(F.col("k").isNotNull() & (F.col("k") != ""))
        .distinct()
        .select("k", F.length("k").alias("n"))
        .persist()
    )

    # --- main path: both keys longer than d (all segments non-empty)
    idx = (
        keys.filter(F.col("n") > d)
        .select(
            F.col("k").alias("b"),
            F.col("n").alias("nb"),
            F.explode(F.expr(_segments_expr("n", d))).alias("s"),
        )
        .select(
            "b",
            "nb",
            F.col("s.i").alias("i"),
            F.expr("substring(b, s.start + 1, s.len)").alias("seg"),
        )
    )
    probes = (
        keys.select(
            F.col("k").alias("a"),
            F.col("n").alias("na"),
            # partner lengths within tolerance whose scheme has non-empty
            # segments (partners of length <= d are the tiny path's job)
            F.explode(
                F.sequence(
                    F.greatest(F.col("n") - d, F.lit(d + 1)), F.col("n") + d
                )
            ).alias("nb"),
        )
        .select(
            "a",
            "na",
            "nb",
            F.explode(F.expr(_segments_expr("nb", d))).alias("s"),
        )
        .select(
            "a",
            "na",
            "nb",
            F.col("s.i").alias("i"),
            F.col("s.start").alias("st"),
            F.col("s.len").alias("ln"),
            # an untouched segment's copy in `a` starts within ±d of its
            # position in the partner (edits shift positions by <= d)
            F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("sh"),
        )
        .withColumn("j", F.col("st") + F.col("sh"))
        .filter((F.col("j") >= 0) & (F.col("j") + F.col("ln") <= F.col("na")))
        .select(
            "a",
            "nb",
            "i",
            F.expr("substring(a, j + 1, ln)").alias("seg"),
        )
    )
    main = probes.join(idx, ["nb", "i", "seg"]).select("a", "b")

    # --- tiny path: keys of length <= d pair against keys of length
    # <= 2d (length tolerance); both sets are alphabet-bounded because
    # `keys` is DISTINCT — there are at most |charset|^d such strings
    tiny = keys.filter(F.col("n") <= d).select(
        F.col("k").alias("a"), F.col("n").alias("na")
    )
    small = keys.filter(F.col("n") <= 2 * d).select(
        F.col("k").alias("b"), F.col("n").alias("nb")
    )
    tiny_pairs = (
        tiny.crossJoin(small)
        .filter(F.col("a") != F.col("b"))
        .filter(F.abs(F.col("na") - F.col("nb")) <= d)
        .select("a", "b")
    )

    cand = (
        main.unionByName(tiny_pairs)
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
    )
    if dedup:
        cand = cand.distinct()
    inner = list(getattr(df, "_sm_caches", ()))
    return cand, [keys, *inner]


def fuzzy_link_sql(table: str, key_expr: str, max_dist: int = 2) -> str:
    """DuckDB twin of :func:`fuzzy_link` — the same LOSSLESS semantics as
    a brute-force pair scan (the oracle states the contract; the Spark
    side is the scalable plan).

    DIALECT LIMIT: DuckDB's ``levenshtein`` (and ``editdist3`` /
    ``damerau_levenshtein``) counts BYTES, Spark's counts CODE POINTS —
    ``levenshtein('日本語','日本酒')`` is 3 vs 1, ``('cafe','café')`` 2
    vs 1.  Spark's code-point semantics are the operator's contract
    (pinned by pytest); this twin is exact only over ASCII keys, and the
    correctness gate restricts its vocabulary accordingly on BOTH
    engines."""
    return f"""
WITH __k AS (
  SELECT DISTINCT {key_expr}::VARCHAR AS k FROM {table}
  WHERE {key_expr} IS NOT NULL AND {key_expr}::VARCHAR <> ''
)
SELECT x.k AS a, y.k AS b, levenshtein(x.k, y.k)::BIGINT AS dist
FROM __k x JOIN __k y ON x.k < y.k
WHERE abs(len(x.k) - len(y.k)) <= {max_dist}
  AND levenshtein(x.k, y.k) <= {max_dist}"""


# ------------------------------------------- sorted-neighborhood blocking
#
# The OTHER classic linkage blocking (Hernández & Stolfo, SIGMOD 1995),
# complementary to PassJoin above: sort the keys, then compare each key
# only with its w-1 successors in sorted order.  Lossy BY DESIGN (a
# qualifying pair further than w apart in sort order is missed — recall
# is the window's job, precision the verifier's), but the candidate
# count is exactly (w-1)·n regardless of value distribution — the
# bound PassJoin cannot give when segment strings repeat.  Production
# linkage stacks run BOTH and union the candidates (multi-pass SNM).
#
# Scale shape: the naive rank source — row_number() OVER (ORDER BY key)
# — plans a SinglePartition window (every row through one task).  The
# distributed form here keeps everything parallel:
#
#   1. repartitionByRange(key) + sortWithinPartitions  (range exchange)
#   2. per-PARTITION ranks via a window PARTITIONED by partition id
#   3. partition row-counts (P tiny rows) → cumulative offsets via a
#      window over just those P rows → broadcast back
#   4. global_rank = local_rank + offset; neighbor pairs are ONE
#      equi-join on rank + exploded offsets 1..w-1
#
# Cross-partition adjacency needs no boundary replication: the rank
# join is global, so a pair straddling two range partitions still
# meets in the shuffle on its rank key.


def sorted_neighborhood_link(
    df: DataFrame,
    key_col: str,
    window: int = 4,
    max_dist: int = 2,
    partitions: int = 32,
) -> DataFrame:
    """``a, b, dist`` (``a`` before ``b`` in sort order) for distinct
    non-empty keys within ``window`` positions and edit distance ≤
    ``max_dist``."""
    from scholarmind_spark.util import attach_caches

    cand, caches = _snm_candidates(df, key_col, window, partitions)
    out = (
        cand.where(
            # cheap length band BEFORE the O(len²) edit distance — the
            # same prefilter fuzzy_link applies; a length gap > max_dist
            # already disqualifies the pair
            F.abs(F.length("a") - F.length("b")) <= max_dist
        )
        .select("a", "b", F.levenshtein("a", "b").alias("dist"))
        .where(F.col("dist") <= max_dist)
        .orderBy("a", "b")
    )
    return attach_caches(out, caches)


def _snm_candidates(
    df: DataFrame, key_col: str, window: int, partitions: int = 32
) -> tuple[DataFrame, list[DataFrame]]:
    """The sorted-neighborhood blocking stage alone: ``(a, b)`` pairs
    within ``window`` sort positions (``a`` before ``b`` ⇒ ``a < b``
    lexicographically; exactly (w-1)·n pairs, minus the tail), plus the
    persist()-ed ranked relation — for :func:`link_candidates`."""
    if window < 2:
        raise ValueError("window must be >= 2 (w-1 successors)")
    from pyspark.sql.window import Window as W

    # cast to string like _passjoin_candidates: a numeric key would (a)
    # make the `!= ''` guard throw under ANSI, and (b) sort/canonicalize
    # pairs numerically while PassJoin and the DuckDB twin order
    # lexicographically — splitting the multi-pass dedup on (a, b)
    keys = (
        df.select(F.col(key_col).cast("string").alias("k"))
        .where(F.col("k").isNotNull() & (F.col("k") != ""))
        .distinct()
        .repartitionByRange(partitions, "k")
        .sortWithinPartitions("k")
        .withColumn("pid", F.spark_partition_id())
    )
    # persist(): the pid column must be IDENTICAL in the counts branch
    # (offsets) and the ranked branch — repartitionByRange boundaries
    # come from sampling, and independently re-executed exchanges (e.g.
    # spark.sql.exchange.reuse=false) could sample different boundaries,
    # misaligning offsets with pids.  The cache pins one materialization
    # (and skips recomputing the distinct+range-sort per consumer).
    local = keys.withColumn(
        "lr", F.row_number().over(W.partitionBy("pid").orderBy("k"))
    ).persist()
    counts = local.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.withColumn(
        "off",
        F.coalesce(
            F.sum("n").over(
                W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("pid", "off")
    ranked = local.join(F.broadcast(offsets), "pid").select(
        "k", (F.col("lr") + F.col("off")).alias("rank")
    )
    offs = F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("o")
    probe = (
        ranked.select(F.col("k").alias("a"), "rank", offs)
        .select("a", (F.col("rank") + F.col("o")).alias("rank"))
    )
    cand = probe.join(
        ranked.select(F.col("k").alias("b"), "rank"), "rank"
    ).select("a", "b")
    return cand, [local]


def sorted_neighborhood_link_sql(
    table: str, key_expr: str, window: int = 4, max_dist: int = 2
) -> str:
    """DuckDB twin of :func:`sorted_neighborhood_link` — plain
    row_number ranks (the oracle runs at gate scale; the distributed
    rank construction is Spark-side plumbing that changes no value).

    Dialect limit (same as :func:`fuzzy_link_sql`): DuckDB's
    ``levenshtein`` counts BYTES while Spark's counts code points, so
    non-ASCII keys can disagree ('café'/'cafe' is 2 vs 1).  The gate
    fixture is ASCII; callers twinning non-ASCII keys must normalize
    first."""
    if window < 2:
        raise ValueError("window must be >= 2 (w-1 successors)")
    return f"""
WITH keys AS (
  SELECT DISTINCT {key_expr} AS k FROM {table}
  WHERE {key_expr} IS NOT NULL AND {key_expr} <> ''
),
ranked AS (
  SELECT k, row_number() OVER (ORDER BY k) AS rank FROM keys
),
probe AS (
  SELECT r.k AS a, r.rank + o.o AS rank
  FROM ranked r, (SELECT unnest(range(1, {window})) AS o) o
),
cand AS (
  SELECT p.a, r2.k AS b, levenshtein(p.a, r2.k)::BIGINT AS dist
  FROM probe p JOIN ranked r2 ON p.rank = r2.rank
  WHERE abs(length(p.a) - length(r2.k)) <= {max_dist}
)
SELECT a, b, dist FROM cand
WHERE dist <= {max_dist}
ORDER BY a, b
"""


# --------------------------------------------------- multi-pass union
#
# Production linkage stacks run SEVERAL blockers and union their
# candidates before one verification stage (the multi-pass SNM of
# Hernández & Stolfo §4; Papadakis et al.'s blocking surveys call it
# block union): each blocker has a blind spot — PassJoin is lossless
# for edit distance but its candidate volume tracks segment-match
# frequency, SNM's volume is a hard (w-1)·n but it misses qualifying
# pairs further than w apart in sort order.  Running both costs two
# candidate generations and ONE shared verify; provenance flags record
# which blocker surfaced each surviving pair (the operational signal
# for tuning w).


def link_candidates(
    df: DataFrame,
    key_col: str,
    max_dist: int = 2,
    window: int = 4,
    passes: tuple[str, ...] = ("passjoin", "snm"),
    partitions: int = 32,
) -> DataFrame:
    """``a, b, dist, via_passjoin, via_snm`` — the union of the enabled
    blocking passes' candidates, deduplicated, then verified ONCE
    (length band + levenshtein ≤ ``max_dist``).

    Both blockers emit ``a < b`` (PassJoin canonicalizes via least/
    greatest; SNM's sort order is lexicographic), so the union
    deduplicates on the pair itself — one groupBy, map-side combinable.
    Because PassJoin is lossless, enabling it makes the OUTPUT the
    complete ≤ max_dist pair set and ``via_snm`` an annotation of SNM's
    recall — which the link_multipass gate exploits: its brute-force
    oracle recomputes both flags independently.

    Scale: candidates are never re-verified per pass — a pair surfaced
    by both blockers reaches levenshtein once.  The groupBy key (a, b)
    is high-entropy (distinct key pairs), no skew; each blocker's
    internal persists ride along via attach_caches."""
    from functools import reduce

    from scholarmind_spark.util import attach_caches

    unknown = set(passes) - {"passjoin", "snm"}
    if unknown or not passes:
        raise ValueError(f"passes must be non-empty from {{'passjoin','snm'}}, got {passes!r}")
    branches: list[DataFrame] = []
    caches: list[DataFrame] = []
    if "passjoin" in passes:
        # dedup=False: the merged groupBy(a, b) below already collapses
        # duplicates (same branch-constant flags), so the blocker's own
        # distinct would shuffle the identical keys twice
        cand, cc = _passjoin_candidates(df, key_col, max_dist, dedup=False)
        branches.append(
            cand.select(
                "a",
                "b",
                F.lit(True).alias("via_passjoin"),
                F.lit(False).alias("via_snm"),
            )
        )
        caches += cc
    if "snm" in passes:
        cand, cc = _snm_candidates(df, key_col, window, partitions)
        branches.append(
            cand.select(
                "a",
                "b",
                F.lit(False).alias("via_passjoin"),
                F.lit(True).alias("via_snm"),
            )
        )
        caches += cc
    merged = (
        reduce(lambda x, y: x.unionByName(y), branches)
        .groupBy("a", "b")
        .agg(
            F.max("via_passjoin").alias("via_passjoin"),
            F.max("via_snm").alias("via_snm"),
        )
    )
    out = (
        merged.where(F.abs(F.length("a") - F.length("b")) <= max_dist)
        .withColumn("dist", F.levenshtein("a", "b"))
        .where(F.col("dist") <= max_dist)
        .select("a", "b", "dist", "via_passjoin", "via_snm")
    )
    return attach_caches(out, caches)


def link_candidates_sql(
    table: str,
    key_expr: str,
    max_dist: int = 2,
    window: int = 4,
) -> str:
    """DuckDB twin of :func:`link_candidates` (both passes enabled) —
    stated as the BRUTE-FORCE contract: every distinct-key pair within
    ``max_dist`` edits, ``via_passjoin`` always true (PassJoin is
    lossless), ``via_snm`` true iff the pair sits within ``window``
    positions in sorted key order.  Same ASCII-only levenshtein dialect
    limit as :func:`fuzzy_link_sql`."""
    return f"""
WITH keys AS (
  SELECT DISTINCT {key_expr}::VARCHAR AS k FROM {table}
  WHERE {key_expr} IS NOT NULL AND {key_expr}::VARCHAR <> ''
),
ranked AS (
  SELECT k, row_number() OVER (ORDER BY k) AS rank FROM keys
),
pairs AS (
  SELECT x.k AS a, y.k AS b,
         levenshtein(x.k, y.k)::BIGINT AS dist,
         (ry.rank - rx.rank) AS gap
  FROM keys x
  JOIN keys y ON x.k < y.k
  JOIN ranked rx ON rx.k = x.k
  JOIN ranked ry ON ry.k = y.k
  WHERE abs(length(x.k) - length(y.k)) <= {max_dist}
)
SELECT a, b, dist,
       TRUE AS via_passjoin,
       (gap <= {window - 1}) AS via_snm
FROM pairs
WHERE dist <= {max_dist}
"""
