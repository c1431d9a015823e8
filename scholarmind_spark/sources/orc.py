"""ORC source/sink: Spark-native columnar alternative to parquet.

ORC is first-class in Spark (vectorized reader, predicate pushdown,
column pruning — the same Catalyst paths as parquet), so the engine
exposes it for interop with ORC-based lakes.  The reader takes an
explicit schema by default: schema inference costs a file-listing pass
and silently widens types, both wrong at 100 TB.

DuckDB has no ORC reader, so the correctness gate checks this source by
ROUND-TRIP: write from parquet-derived data, read back, aggregate, and
hash-compare against the oracle aggregating the original parquet — any
value the codec mangles breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
