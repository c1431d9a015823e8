"""Multi-source union (reference U0, ``parsers_manager.py:67-72``).

The reference's ragged ``pd.concat`` (missing columns → NaN) maps to
``unionByName(allowMissingColumns=True)``; Spark fills absent columns with
typed nulls and the fixed RECORD_SCHEMA keeps the superset stable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_sources(dfs: list[DataFrame]) -> DataFrame:
    if not dfs:
        raise ValueError("union_sources needs at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
