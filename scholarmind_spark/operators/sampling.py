"""Deterministic sampling & splitting for training-data pipelines.

``df.sample()``/``sampleBy()`` are seeded-random per partition — results
change under repartitioning, which makes lineage audits and incremental
rebuilds impossible at 100 TB.  These operators derive every decision from
a HASH OF THE ROW KEY instead: stable under any partitioning, any cluster
size, any engine (md5-based, so DuckDB reproduces them bit-for-bit), and
join-free (a pure projection/filter that pushes down to the scan).

- :func:`hash_bucket` — uniform bucket in [0, buckets) from the key.
- :func:`deterministic_split` — train/val/test by cumulative weight over
  the hash bucket (the standard reproducible split).
- :func:`stratified_sample` — per-class keep-rates applied via the same
  bucket (downsample overrepresented classes deterministically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scholarmind_spark.operators.neardup import minhash_base

N_BUCKETS = 1_000_000


def hash_bucket(key: Column, buckets: int = N_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, buckets): 60-bit md5 of the key
    string, modulo buckets."""
    return minhash_base(key.cast("string")) % buckets


def hash_bucket_sql(expr: str, buckets: int = N_BUCKETS) -> str:
    return f"((('0x' || substring(md5(({expr})::VARCHAR), 1, 15))::BIGINT) % {buckets})"


def deterministic_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label by cumulative weight over its hash
    bucket — e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``.  The same
    key ALWAYS lands in the same split, on any engine or cluster."""
    total = sum(weights.values())
    b = hash_bucket(F.col(key))
    expr: Column | None = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        cond = b < int(cum * N_BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def deterministic_split_sql(
    key_expr: str, weights: dict[str, float], buckets: int = N_BUCKETS
) -> str:
    total = sum(weights.values())
    b = hash_bucket_sql(key_expr, buckets)
    items = list(weights.items())
    whens, cum = [], 0.0
    for name, w in items[:-1]:
        cum += w / total
        whens.append(f"WHEN {b} < {int(cum * buckets)} THEN '{name}'")
    return f"CASE {' '.join(whens)} ELSE '{items[-1][0]}' END"


def stratified_sample(
    df: DataFrame,
    key: str,
    class_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row with its class's rate, decided by the row's hash
    bucket — deterministic ``sampleBy``.  Classes absent from ``rates``
    keep ``default_rate``."""
    b = hash_bucket(F.col(key))
    rate: Column = F.lit(default_rate)
    for cls, r in sorted(rates.items()):
        rate = F.when(F.col(class_col) == cls, F.lit(r)).otherwise(rate)
    return df.filter(b < (rate * N_BUCKETS).cast("bigint"))


def stratified_sample_sql(
    key_expr: str,
    class_expr: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    buckets: int = N_BUCKETS,
) -> str:
    b = hash_bucket_sql(key_expr, buckets)
    rate = f"{default_rate}"
    for cls, r in sorted(rates.items()):
        rate = f"CASE WHEN {class_expr} = '{cls}' THEN {r} ELSE {rate} END"
    # floor() before ::BIGINT: DuckDB's cast ROUNDS to nearest while
    # Spark's .cast('bigint') truncates — at a rate whose rate*buckets
    # lands on .5 the two engines would keep different bucket sets
    # (mixture_sample_sql already guards this; same fix here)
    return f"{b} < floor(({rate}) * {buckets})::BIGINT"


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    n: int,
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized (A-ES,
    Efraimidis & Spirakis, "Weighted random sampling with a reservoir",
    IPL 2006): each row gets priority ``u^(1/w)`` with ``u`` uniform —
    the top-``n`` priorities are a weighted sample.  Here ``u`` is the
    row's deterministic hash bucket mapped to ``(0,1)``, so the sample is
    reproducible on any engine/cluster like every sampler in this module,
    and we rank by the monotone-equivalent ``ln(u)/w`` (no pow).  Rows
    with non-positive weight are excluded (zero weight = never sampled).

    Top-n is ``orderBy().limit(n)`` — TakeOrderedAndProject (per-partition
    heaps, no global sort); ties (identical bucket AND weight) break by
    ascending key."""
    u = (hash_bucket(F.col(key), buckets) + F.lit(0.5)) / F.lit(float(buckets))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__pri", F.log(u) / F.col(weight_col))
        .orderBy(F.desc("__pri"), F.asc(key))
        .limit(n)
        .drop("__pri")
    )


def weighted_sample_sql(
    table: str,
    key_expr: str,
    weight_expr: str,
    n: int,
    buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`weighted_sample` (same hash-uniform, same
    ``ln(u)/w`` priority, same tie-break; literals cast ``::DOUBLE`` so
    DuckDB never switches to exact-decimal arithmetic)."""
    b = hash_bucket_sql(key_expr, buckets)
    pri = f"ln(({b} + 0.5::DOUBLE) / {float(buckets)!r}::DOUBLE) / ({weight_expr})"
    return f"""
SELECT * EXCLUDE (__pri) FROM (
  SELECT *, {pri} AS __pri FROM {table} WHERE ({weight_expr}) > 0
  ORDER BY __pri DESC, {key_expr} ASC LIMIT {n}
)
"""


def mixture_sample(
    df: DataFrame,
    key: str,
    class_col: str,
    target_weights: dict[str, float],
) -> DataFrame:
    """Down-sample to a target class MIXTURE without replication: the
    largest dataset achievable where class proportions equal
    ``target_weights`` keeps every row of the binding (scarcest-relative-
    to-weight) class and hash-samples the rest down to proportion.

    The per-class keep rates are derived IN the plan (one tiny class-count
    aggregate joined back broadcast-style), and the keep decision is the
    same deterministic hash bucket the split/sample operators use — same
    key, same verdict, any engine, any cluster.  Classes absent from
    ``target_weights`` are dropped.  This is the "dataset mixing" step of
    a pretraining pipeline (e.g. 60/30/10 web/code/books) as one shuffle-
    free filter over a broadcastable per-class rate table."""
    total_w = sum(target_weights.values())
    # per-class counts → binding scale T = min(count_c / w_c); rate_c =
    # w_c * T / count_c (1.0 for the binding class)
    w_expr: Column = None
    for cls, w in sorted(target_weights.items()):
        cond = F.col(class_col) == cls
        lit = F.lit(w / total_w)
        w_expr = F.when(cond, lit) if w_expr is None else w_expr.when(cond, lit)
    w_expr = w_expr.otherwise(F.lit(None))
    counts = (
        df.withColumn("__w", w_expr)
        .filter(F.col("__w").isNotNull())
        .groupBy(class_col, "__w")
        .agg(F.count("*").alias("__n"))
    )
    scale = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__t"))
    # the binding class must keep EVERY row (rate exactly 1.0), but its
    # recomputed rate (__w * __t) / __n can land at 0.999.. in floating
    # point, and floor(rate * buckets) would then drop the top hash
    # bucket.  Detect the binding class by comparing __n/__w — the SAME
    # float expression the min was computed from, so equality is exact —
    # and pin its rate to 1.0 (both engines, identically).
    rates = counts.crossJoin(F.broadcast(scale)).select(
        class_col,
        F.when((F.col("__n") / F.col("__w")) <= F.col("__t"), F.lit(1.0))
        .otherwise(
            F.least(F.lit(1.0), (F.col("__w") * F.col("__t")) / F.col("__n"))
        )
        .alias("__rate"),
    )
    b = hash_bucket(F.col(key))
    return (
        df.join(F.broadcast(rates), on=class_col)
        .filter(b < (F.col("__rate") * N_BUCKETS).cast("bigint"))
        .drop("__rate")
    )


def mixture_sample_sql(
    table: str,
    key_expr: str,
    class_expr: str,
    target_weights: dict[str, float],
    buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`mixture_sample` (same rate derivation, same
    hash buckets, same float operation order)."""
    total_w = sum(target_weights.values())
    w_case = "NULL"
    for cls, w in sorted(target_weights.items(), reverse=True):
        w_case = f"CASE WHEN {class_expr} = '{cls}' THEN {w / total_w!r} ELSE {w_case} END"
    return f"""
WITH w AS (
  SELECT *, {w_case} AS __w FROM {table}
),
counts AS (
  SELECT {class_expr} AS __cls, __w, count(*) AS __n
  FROM w WHERE __w IS NOT NULL GROUP BY __cls, __w
),
scale AS (
  SELECT min(__n / __w) AS __t FROM counts
),
rates AS (
  SELECT __cls, CASE WHEN (__n / __w) <= __t THEN 1.0
                     ELSE least(1.0, (__w * __t) / __n) END AS __rate
  FROM counts CROSS JOIN scale
)
SELECT t.* FROM {table} t
JOIN rates ON t.{class_expr} = rates.__cls
WHERE {hash_bucket_sql(key_expr, buckets)} < floor(__rate * {buckets})::BIGINT
"""


def mixture_sample_tokens(
    df: DataFrame,
    key: str,
    class_col: str,
    text_col: str,
    target_weights: dict[str, float],
) -> DataFrame:
    """Down-sample to a target TOKEN mixture — the realistic pretraining
    recipe knob: training mixes are specified in token shares (e.g. "60%
    web / 25% code tokens"), and when per-document lengths differ across
    sources, row-proportional sampling (:func:`mixture_sample`) silently
    misses the token target.

    Same derivation as the row mixture with the measure swapped: per-class
    TOKEN totals T_c (whitespace tokens, the ``textstats.token_count``
    device), binding scale ``T = min(T_c / w_c)``, per-class keep rate
    ``w_c·T / T_c`` (exactly 1.0 for the binding class, same
    float-equality pinning), deterministic hash-bucket keep on ``key``.

    Honesty note: rows are kept whole, so the realized token share is the
    target IN EXPECTATION (hash-sampling rows is unbiased in tokens);
    per-run realized shares wobble by the length distribution.  Exact
    token-level shares would require splitting documents — a different
    operator (chunking) composed upstream, not a sampling concern.

    One aggregate over class token totals (map-side partial sum, shuffle
    is |classes| rows), one broadcast rate join, zero data shuffles.
    """
    from scholarmind_spark.operators.textstats import token_count

    total_w = sum(target_weights.values())
    w_expr: Column = None
    for cls, w in sorted(target_weights.items()):
        cond = F.col(class_col) == cls
        lit = F.lit(w / total_w)
        w_expr = F.when(cond, lit) if w_expr is None else w_expr.when(cond, lit)
    w_expr = w_expr.otherwise(F.lit(None))
    counts = (
        df.withColumn("__w", w_expr)
        .filter(F.col("__w").isNotNull())
        # token counts sum as BIGINT: integer addition is order-free, so
        # the class totals (and every rate derived from them) are
        # identical on any partitioning and any engine — a double sum
        # here would make the mixture nondeterministic at the margin
        .withColumn("__tc", token_count(F.col(text_col)).cast("bigint"))
        .groupBy(class_col, "__w")
        .agg(F.sum("__tc").alias("__n"))
    )
    scale = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__t"))
    rates = counts.crossJoin(F.broadcast(scale)).select(
        class_col,
        F.when((F.col("__n") / F.col("__w")) <= F.col("__t"), F.lit(1.0))
        .otherwise(
            F.least(F.lit(1.0), (F.col("__w") * F.col("__t")) / F.col("__n"))
        )
        .alias("__rate"),
    )
    b = hash_bucket(F.col(key))
    return (
        df.join(F.broadcast(rates), on=class_col)
        .filter(b < (F.col("__rate") * N_BUCKETS).cast("bigint"))
        .drop("__rate")
    )


def mixture_sample_tokens_sql(
    table: str,
    key_expr: str,
    class_expr: str,
    text_expr: str,
    target_weights: dict[str, float],
    buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`mixture_sample_tokens` (same token count,
    same rate derivation, same hash buckets, same float order)."""
    from scholarmind_spark.operators.textstats import tokens_sql

    total_w = sum(target_weights.values())
    w_case = "NULL"
    for cls, w in sorted(target_weights.items(), reverse=True):
        w_case = (
            f"CASE WHEN {class_expr} = '{cls}' THEN {w / total_w!r}"
            f" ELSE {w_case} END"
        )
    tc = f"len({tokens_sql(text_expr)})::BIGINT"
    return f"""
WITH w AS (
  SELECT *, {w_case} AS __w FROM {table}
),
counts AS (
  SELECT {class_expr} AS __cls, __w, sum({tc})::BIGINT AS __n
  FROM w WHERE __w IS NOT NULL GROUP BY __cls, __w
),
scale AS (
  SELECT min(__n / __w) AS __t FROM counts
),
rates AS (
  SELECT __cls, CASE WHEN (__n / __w) <= __t THEN 1.0
                     ELSE least(1.0, (__w * __t) / __n) END AS __rate
  FROM counts CROSS JOIN scale
)
SELECT t.* FROM {table} t
JOIN rates ON t.{class_expr} = rates.__cls
WHERE {hash_bucket_sql(key_expr, buckets)} < floor(__rate * {buckets})::BIGINT
"""


def mixture_sample_tokens_upsample(
    df: DataFrame,
    key: str,
    class_col: str,
    text_col: str,
    target_weights: dict[str, float],
    max_epochs: int = 4,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Token-budget mixing with UP-sampling under a repetition cap — the
    full pretraining recipe: scarce high-quality sources are repeated
    (bounded epochs, e.g. LLaMA's Wikipedia at 2.45 epochs, Books at
    2.23; Touvron et al. 2023 Table 1) rather than the mix silently
    missing its target the way a down-sample-only pass must when the
    scarce class runs out of tokens (:func:`mixture_sample_tokens`
    clamps rates to ≤ 1.0).

    Derivation: per-class TOKEN totals ``T_c`` (exact BIGINT sums — the
    order-free discipline of the down-sample twin), binding scale
    ``m = min(T_c / w_c)``; the realized total is pushed to the largest
    value every class can serve within ``max_epochs`` repetitions, so
    ``rate_c = least(max_epochs, (w_c · m / T_c) · max_epochs)`` — the
    BINDING class (the min, float-equality pinned) lands exactly at
    ``max_epochs``, abundant classes keep ``rate < 1`` (pure
    down-sample), scarce non-binding classes land in ``(1, max_epochs)``.

    Materialization is deterministic and join-free past the one
    |classes|-row broadcast rate join: each row explodes into
    ``ceil(rate)`` epoch-tagged candidates (``epoch_col`` = 0, 1, …);
    epochs below ``floor(rate)`` are whole copies, the one fractional
    epoch keeps the row iff ``hash_bucket(key + '#' + epoch)`` clears the
    fractional rate — per-epoch hashes, so the fractional subset is
    independent of the epoch-0 keep decision and stable under any
    partitioning/engine.  With ``max_epochs = 1`` this degrades exactly
    to the down-sample operator's keep set (different hash salt).

    Scale shape: one vocab-free aggregate (|classes| rows shuffled), one
    broadcast join, one generator projection — zero data shuffles; the
    output is at most ``max_epochs`` × the input, and only for classes
    the recipe explicitly repeats.  Realized shares are the target in
    expectation (rows kept whole — the down-sample twin's honesty note
    applies unchanged).
    """
    from scholarmind_spark.operators.textstats import token_count

    e = int(max_epochs)
    if e < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    total_w = sum(target_weights.values())
    w_expr: Column = None
    for cls, w in sorted(target_weights.items()):
        cond = F.col(class_col) == cls
        lit = F.lit(w / total_w)
        w_expr = F.when(cond, lit) if w_expr is None else w_expr.when(cond, lit)
    w_expr = w_expr.otherwise(F.lit(None))
    counts = (
        df.withColumn("__w", w_expr)
        .filter(F.col("__w").isNotNull())
        .withColumn("__tc", token_count(F.col(text_col)).cast("bigint"))
        .groupBy(class_col, "__w")
        .agg(F.sum("__tc").alias("__n"))
    )
    scale = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__t"))
    # binding class pinned by float equality (it IS the min of the same
    # computed doubles), exactly the down-sample twin's discipline
    rates = counts.crossJoin(F.broadcast(scale)).select(
        class_col,
        F.when((F.col("__n") / F.col("__w")) <= F.col("__t"), F.lit(float(e)))
        .otherwise(
            F.least(
                F.lit(float(e)),
                (F.col("__w") * F.col("__t") / F.col("__n")) * F.lit(float(e)),
            )
        )
        .alias("__rate"),
    )
    frac_cut = (
        (F.col("__rate") - F.floor(F.col("__rate"))) * N_BUCKETS
    ).cast("bigint")
    b = hash_bucket(
        F.concat_ws("#", F.col(key).cast("string"), F.col(epoch_col).cast("string"))
    )
    out = (
        df.join(F.broadcast(rates), on=class_col)
        .withColumn(
            epoch_col,
            # int sequence bounds → array<int> → epoch is INT unexploded
            # (a cast wrapper around explode would nest the generator)
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.col("__rate")).cast("int"), F.lit(1)
                    ) - F.lit(1),
                )
            ),
        )
        .filter((F.col(epoch_col) < F.floor(F.col("__rate"))) | (b < frac_cut))
        .drop("__rate")
    )
    return out


def mixture_sample_tokens_upsample_sql(
    table: str,
    key_expr: str,
    class_expr: str,
    text_expr: str,
    target_weights: dict[str, float],
    max_epochs: int = 4,
    epoch_col: str = "epoch",
    buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin of :func:`mixture_sample_tokens_upsample` (same token
    count, same rate derivation and float order, same per-epoch hash)."""
    from scholarmind_spark.operators.textstats import tokens_sql

    e = int(max_epochs)
    total_w = sum(target_weights.values())
    w_case = "NULL"
    for cls, w in sorted(target_weights.items(), reverse=True):
        w_case = (
            f"CASE WHEN {class_expr} = '{cls}' THEN {w / total_w!r}"
            f" ELSE {w_case} END"
        )
    tc = f"len({tokens_sql(text_expr)})::BIGINT"
    eh = hash_bucket_sql(
        f"({key_expr})::VARCHAR || '#' || {epoch_col}::VARCHAR", buckets
    )
    return f"""
WITH w AS (
  SELECT *, {w_case} AS __w FROM {table}
),
counts AS (
  SELECT {class_expr} AS __cls, __w, sum({tc})::BIGINT AS __n
  FROM w WHERE __w IS NOT NULL GROUP BY __cls, __w
),
scale AS (
  SELECT min(__n / __w) AS __t FROM counts
),
rates AS (
  SELECT __cls,
         CASE WHEN (__n / __w) <= __t THEN CAST({e} AS DOUBLE)
              ELSE least(CAST({e} AS DOUBLE), (__w * __t / __n) * CAST({e} AS DOUBLE))
         END AS __rate
  FROM counts CROSS JOIN scale
),
cand AS MATERIALIZED (
  -- MATERIALIZED: the binder cannot resolve the unnest() output column
  -- once this CTE is inlined under the outer EXCLUDE projection
  SELECT t.*, rates.__rate,
         unnest(range(0, greatest(ceil(rates.__rate)::BIGINT, 1))) AS __e
  FROM {table} t
  JOIN rates ON t.{class_expr} = rates.__cls
),
tagged AS (
  SELECT * EXCLUDE (__e), __e::INTEGER AS {epoch_col} FROM cand
)
SELECT * EXCLUDE (__rate) FROM tagged
WHERE {epoch_col} < floor(__rate)
   OR {eh} < floor((__rate - floor(__rate)) * {buckets})::BIGINT
"""
