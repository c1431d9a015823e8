"""Deterministic corpus shuffling and curriculum ordering.

Engine extension (SURVEY §2): training pipelines need the corpus in a
RANDOM-LOOKING but REPRODUCIBLE order — epoch shuffles that any
re-run (or any engine) reproduces bit-for-bit, resumable mid-epoch,
with no RNG state to checkpoint.  The standard trick: give every row
a pseudorandom position derived from a keyed hash, then range-order
by it.

    pos = int60( md5( seed ⊕ key ) )

(15 hex chars → 60-bit signed-safe bigint — the repo's engine-portable
hash device from operators/neardup.py.)  Different seeds give
independent permutations (epoch 0, 1, ...).  ``curriculum`` ordering
prepends a coarse band (e.g. a quality tier): ordering is
band-major, hash-minor — ramping difficulty while still shuffling
within each band.

Spark-first shape: the position is one JVM expression; a global order
at 100 TB is ``repartitionByRange(pos)`` + per-partition sort (range
exchange, never a single-task sort), which is exactly what Catalyst
plans for ``orderBy(pos)``.  Readers that only need partition-local
shuffling skip the exchange and sort within partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_pos(seed: int, *keys: Column) -> Column:
    """60-bit deterministic pseudorandom position for (seed, keys).

    NULL keys fold to '' explicitly on BOTH engines: Spark's concat_ws
    would silently skip a NULL argument (position from seed alone) while
    DuckDB's ``||`` propagates NULL through md5 to a NULL position —
    divergent ordering for null keys without the coalesce."""
    tagged = F.concat_ws(
        "\x1f",
        F.lit(str(seed)),
        *[F.coalesce(k.cast("string"), F.lit("")) for k in keys],
    )
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("bigint")


def shuffle_pos_sql(seed: int, key_expr: str) -> str:
    """DuckDB twin of :func:`shuffle_pos` (single key expression)."""
    return (
        f"(('0x' || substring(md5('{seed}' || chr(31) ||"
        f" coalesce(({key_expr})::VARCHAR, '')), 1, 15))::BIGINT)"
    )


def deterministic_shuffle(
    df: DataFrame,
    key_cols: list[str],
    seed: int = 0,
    band: Column | None = None,
) -> DataFrame:
    """The input plus ``shuffle_pos`` (and ``band`` if given), ordered
    band-major / hash-minor with the key as the total-order tiebreak."""
    out = df.withColumn(
        "shuffle_pos", shuffle_pos(seed, *[F.col(c) for c in key_cols])
    )
    order = [F.col("shuffle_pos")] + [F.col(c) for c in key_cols]
    if band is not None:
        out = out.withColumn("band", band)
        order = [F.col("band")] + order
    return out.orderBy(*order)
