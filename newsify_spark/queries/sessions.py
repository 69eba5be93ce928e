"""Session-window queries (T-extra): Spark's native ``F.session_window``
— the streaming-first formulation of sessionization. Unlike the manual
lag/cumsum form (``rel_sessionize``), ``session_window`` is a
merging-window GROUP BY the streaming engine maintains incrementally
with watermark-evicted state, so the SAME expression runs batch (here,
oracle-checked) and as an unbounded stream (``sessionized_stream``).

Reference parity: the reference has no session concept; this is part of
the beyond-reference streaming surface (SURVEY §2.10 extensions), kept
because training-data event pipelines sessionize clickstreams at ingest.

Scale: one shuffle on the grouping key (user_id); session merging happens
inside the aggregation — no self-join, no window over the whole table.
Per-user state is bounded by the gap (closed sessions are emitted and
dropped in streaming mode by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsify_spark.queries.registry import register
from newsify_spark.tables import load

GAP = "1 hour"

# Spark merges an event into the current session iff it lands strictly
# before prev_end = prev_max_ts + gap; the DuckDB oracle reproduces that
# with the classic gaps-and-islands cumulative sum at gap >= 1h.
_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(date_trunc('microseconds', ts))
                   - epoch_us(date_trunc('microseconds', lag(ts) OVER w)) >= 3600000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  -- cumsum MUST visit rows in the same ts,event_id order as the lag
  -- window: with duplicate (user_id, ts) at a session boundary, ts-only
  -- ordering could visit the flag=1 row after a tied flag=0 row and
  -- split equal-ts events across sessions (Spark's session_window never
  -- does).
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_no
ORDER BY user_id, session_start
"""


@register(
    "stream_session_windows",
    doc="T-extra native session windows: F.session_window(ts, 1h) per "
    "user — merging event-time windows, identical expression batch and "
    "streaming. Oracle: DuckDB gaps-and-islands with gap >= 1h.",
    tags=("T6", "W-extra", "sessions"),
    oracle=_ORACLE,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def sessionized_stream(stream: DataFrame, gap: str = GAP, watermark: str = "2 hours") -> DataFrame:
    """Unbounded form: same session_window aggregate over a streaming
    DataFrame. The watermark closes sessions whose end has passed and
    evicts their state — REQUIRED on streams (append mode emits a
    session only once it can no longer grow)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
