"""Shared plan-shaping helpers."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

_PROC_TMP_BASE: str | None = None


def proc_tmp_dir(name: str) -> str:
    """A fixed-named reuse directory under a per-process private base.

    The base is one ``mkdtemp`` (mode 0700, unpredictable name) created
    lazily per process — so fixed names like ``sm_jsonl`` stay reusable
    across battery/bench reps (no per-rep leak) without the pre-create /
    symlink-plant exposure of predictable ``/tmp/sm_jsonl_<pid>`` paths,
    and a recycled pid can never pick up a stale dir from an unrelated
    earlier process."""
    global _PROC_TMP_BASE
    if _PROC_TMP_BASE is None or not os.path.isdir(_PROC_TMP_BASE):
        _PROC_TMP_BASE = tempfile.mkdtemp(prefix="sm_proc_")
        # unlike the old fixed /tmp/<name>_<pid> paths, a random base can
        # never be reclaimed by a LATER process overwriting it — remove it
        # on exit or every run leaks its corpus-sized sink copies
        import atexit
        import shutil

        atexit.register(shutil.rmtree, _PROC_TMP_BASE, ignore_errors=True)
    d = os.path.join(_PROC_TMP_BASE, name)
    os.makedirs(d, exist_ok=True)
    return d


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition when a LOCAL scan is under-partitioned.

    A small local parquet file arrives as ONE input split, which serializes
    CPU-heavy per-row work (shingling, hashing, Python UDF stages) onto a
    single core.  Off local mode this returns the input untouched — a
    100 TB scan already has thousands of splits and must not be re-shuffled.

    Local mode repartitions unconditionally: probing the current partition
    count costs a ``df.rdd`` plan conversion PER CALL (driver-side latency
    on every operator), while the repartition itself is a cheap local
    exchange that the common case (single-split scan) needs anyway."""
    sc = df.sparkSession.sparkContext
    if not sc.master.startswith("local"):
        return df
    return df.repartition(sc.defaultParallelism)


def attach_caches(out: DataFrame, caches: list[DataFrame]) -> DataFrame:
    """Tag ``out`` with the intermediate ``persist()``-ed relations its plan
    reads, so the consumer can release them after its final action:

        pairs = minhash_lsh_pairs(df)
        rows = pairs.collect()
        release_caches(pairs)

    The operators return LAZY plans (actions belong to the caller), so they
    cannot unpersist internally without either forfeiting the cache before
    the caller's action or paying a second eager materialization.  Callers
    that skip release fall back to Spark's LRU block eviction + the
    ContextCleaner unpersisting caches once the DataFrames are
    garbage-collected."""
    out._sm_caches = list(caches)  # type: ignore[attr-defined]
    return out


def unpersist_any(df: DataFrame) -> None:
    """Free the materialized blocks behind ``df`` whether it was
    ``persist()``-ed (CacheManager entry) or ``localCheckpoint()``-ed
    (checkpoint RDD blocks, which ``Dataset.unpersist`` does NOT release —
    they are only reachable through the plan's ``LogicalRDD`` leaf)."""
    try:
        plan = df._jdf.queryExecution().analyzed()  # type: ignore[attr-defined]
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
    df.unpersist()


def release_caches(df: DataFrame) -> None:
    """Unpersist every intermediate cache attached to ``df`` (no-op for
    DataFrames without attached caches)."""
    for c in getattr(df, "_sm_caches", ()):
        unpersist_any(c)
    df._sm_caches = []  # type: ignore[attr-defined]


def carry_caches(src: DataFrame, wrapped: DataFrame) -> DataFrame:
    """Re-attach ``src``'s cache tags to a DataFrame that WRAPS it.

    Any plain DataFrame method (``orderBy``, ``select``, ``crossJoin``,
    ...) returns a NEW object without the ``_sm_caches`` tag, so a
    consumer releasing the wrapper silently strands the persists the
    operator attached — the exact leak class the r15 cache audit fixed
    at three call sites by hand.  This helper is that re-attach idiom in
    one place:

        out = some_operator(df)           # tagged
        return carry_caches(out, out.orderBy("id"))
    """
    return attach_caches(wrapped, list(getattr(src, "_sm_caches", ())))
