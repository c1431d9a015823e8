"""Session path mining: top event-type sequences per session.

Engine extension (SURVEY §2): the "what do users actually do"
aggregate — sessionize an event stream (gap rule), render each
session as its ordered event-type path (``view>click>purchase``),
and rank the most common paths.  Feeds funnel design, bot-pattern
detection, and UX auditing; on a training-data pipeline, the same
shape mines dominant document-processing traces.

Determinism: the per-session ordering is pinned to (ts, event_id) —
collected as structs and ``array_sort``-ed (collect order is not
trusted), mirrored by ``ORDER BY`` inside DuckDB's ``string_agg``.
Paths are capped at ``max_events`` steps so one pathological
never-idle session cannot materialize an unbounded string.

Spark-first shape: one shuffle on user (session window), one partial-
aggregated shuffle on (user, session), one on path; the final top-k
is ``orderBy().limit()`` — TakeOrderedAndProject, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def session_paths(
    events: DataFrame,
    gap_s: int = 1800,
    k: int = 15,
    max_events: int = 20,
) -> DataFrame:
    """``path, n_sessions`` for the ``k`` most common session paths
    (ties broken by path asc)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sess = events.withColumn("session_id", F.sum(is_new).over(w))
    # cap BEFORE the collect: row_number within (user, session) drops
    # everything past max_events, so the aggregate buffers at most
    # max_events structs per session — a never-idle bot session of 1e8
    # events previously materialized entirely in one task just to keep
    # its first 20 event types
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    capped = sess.withColumn("__rn", F.row_number().over(ws)).filter(
        F.col("__rn") <= max_events
    )
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    per_sess = capped.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["event_type"]),
            ">",
        ).alias("path")
    )
    return (
        per_sess.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


def session_paths_sql(
    table: str, gap_s: int = 1800, k: int = 15, max_events: int = 20
) -> str:
    """DuckDB twin of :func:`session_paths`."""
    return f"""
WITH __marked AS (
  SELECT user_id, event_id, ts, event_type,
         -- floor() mirrors Spark's unix_timestamp whole-second truncation;
         -- DuckDB's epoch() keeps fractional seconds, so without it a gap
         -- straddling the boundary would split sessions differently
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > {gap_s}
              THEN 1 ELSE 0 END AS is_new
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
__sess AS (
  SELECT user_id, event_id, ts, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM __marked
),
__paths AS (
  SELECT array_to_string(
           (list(event_type ORDER BY ts, event_id, event_type))[1:{max_events}], '>'
         ) AS path
  FROM __sess GROUP BY user_id, session_id
)
SELECT path, count(*)::BIGINT AS n_sessions
FROM __paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {k}"""
