"""Sessionization — SURVEY.md §2.5 (worker.activity.update interval closing).

The reference closes an AGENT STATUS IN PROGRESS row and opens a new one on
every activity change (reference routes/events.js:639-664) — mutation-based
sessionization. Spark-first: gap-based sessions in one windowed pass per
key: flag gap > threshold, running-sum the flags into a session index,
aggregate. One shuffle on the key; scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exprs import epoch_seconds
from ..registry import register
from ..sources.tables import load_table


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str,
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. Adds ``session_idx`` (1-based
    per key)."""
    w = W.partitionBy(key).orderBy(F.col(ts), F.col(order_tiebreak))
    gap = epoch_seconds(F.col(ts)) - epoch_seconds(F.lag(ts).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


@register(
    "sessionize_events",
    oracle="""
        SELECT
          user_id,
          session_idx,
          date_trunc('second', MIN(ts)) AS session_start,
          date_trunc('second', MAX(ts)) AS session_end,
          CAST(epoch(date_trunc('second', MAX(ts))) AS BIGINT)
            - CAST(epoch(date_trunc('second', MIN(ts))) AS BIGINT) AS duration_seconds,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        FROM (
          SELECT *,
            CAST(SUM(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS session_idx
          FROM (
            SELECT *,
              CAST(epoch(date_trunc('second', ts)) AS BIGINT)
                - CAST(epoch(date_trunc('second',
                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
            FROM events
          )
        )
        GROUP BY user_id, session_idx
    """,
    doc="Gap-based sessionization (30 min) + per-session aggregates.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sessions = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
    return sessions.groupBy("user_id", "session_idx").agg(
        F.date_trunc("second", F.min("ts")).alias("session_start"),
        F.date_trunc("second", F.max("ts")).alias("session_end"),
        (epoch_seconds(F.max("ts")) - epoch_seconds(F.min("ts"))).alias("duration_seconds"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


@register(
    "activity_intervals",
    oracle="""
        SELECT
          user_id,
          event_type AS activity,
          date_trunc('second', ts) AS started_at,
          date_trunc('second', next_ts) AS ended_at,
          CAST(epoch(date_trunc('second', next_ts)) AS BIGINT)
            - CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS activity_seconds,
          (next_ts IS NULL) AS in_progress
        FROM (
          SELECT *,
            LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
          FROM events
          WHERE event_type IN ('view', 'click', 'error')
        )
    """,
    doc=(
        "Interval sessionization per the agent-status state machine "
        "(SURVEY §2.5): each event opens an interval closed by the next "
        "event of the same key; the last interval stays IN PROGRESS "
        "(reference events.js:639-664 recast as lead() — no mutation)."
    ),
)
def activity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("view", "click", "error")
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return ev.withColumn("next_ts", F.lead("ts").over(w)).select(
        "user_id",
        F.col("event_type").alias("activity"),
        F.date_trunc("second", "ts").alias("started_at"),
        F.date_trunc("second", "next_ts").alias("ended_at"),
        (epoch_seconds(F.col("next_ts")) - epoch_seconds(F.col("ts"))).alias("activity_seconds"),
        F.col("next_ts").isNull().alias("in_progress"),
    )
