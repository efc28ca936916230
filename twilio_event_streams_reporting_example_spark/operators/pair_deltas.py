"""Event-pair duration measures via timeline pivot — SURVEY.md §2.4 D2-D4.

The reference computes ring/talk/wrapup times with per-event point lookups
into the log (reference routes/events.js:169-208). Spark-first: ONE
group-by per correlation key pivots each event family's timestamp into a
column (``min(when(...))`` — map-side partial agg, single shuffle), then
every measure is plain column arithmetic. This replaces N lookups × M
events with one aggregation — the O(n²)→O(n) rewrite that matters at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import epoch_seconds
from ..registry import register
from ..sources.tables import load_table


def timeline_pivot(df: DataFrame, key: str, ts: str, type_col: str, types: list[str]) -> DataFrame:
    """One row per key with ``<type>_ts`` = earliest timestamp of each event
    type (first occurrence; the reference's top-1 lookups F3-F5 collapse to
    min/max over the same groups)."""
    aggs = [
        F.min(F.when(F.col(type_col) == t, F.col(ts))).alias(f"{t}_ts") for t in types
    ]
    return df.groupBy(key).agg(*aggs)


def _delta(end_ts: Column, start_ts: Column) -> Column:
    return epoch_seconds(end_ts) - epoch_seconds(start_ts)


@register(
    "user_funnel_deltas",
    oracle="""
        SELECT
          user_id,
          date_trunc('second', signup_ts) AS signup_at,
          date_trunc('second', first_view_ts) AS first_view_at,
          date_trunc('second', first_purchase_ts) AS first_purchase_at,
          CAST(epoch(date_trunc('second', first_view_ts)) AS BIGINT)
            - CAST(epoch(date_trunc('second', signup_ts)) AS BIGINT) AS signup_to_view_seconds,
          CAST(epoch(date_trunc('second', first_purchase_ts)) AS BIGINT)
            - CAST(epoch(date_trunc('second', signup_ts)) AS BIGINT) AS signup_to_purchase_seconds,
          COALESCE(
            CAST(epoch(date_trunc('second', first_purchase_ts)) AS BIGINT)
              - CAST(epoch(date_trunc('second', first_view_ts)) AS BIGINT),
            0) AS view_to_purchase_seconds
        FROM (
          SELECT
            user_id,
            MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
            MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view_ts,
            MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase_ts
          FROM events
          GROUP BY user_id
        )
        WHERE signup_ts IS NOT NULL
    """,
    doc=(
        "D2-D4 analog: per-key timeline pivot then column arithmetic — "
        "ring_time/talk_time/wrapup_time semantics incl. the wrapup_time=0 "
        "null-fallback (reference events.js:197-208)."
    ),
)
def user_funnel_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    tl = timeline_pivot(ev, key="user_id", ts="ts", type_col="event_type",
                        types=["signup", "view", "purchase"])
    return tl.filter(F.col("signup_ts").isNotNull()).select(
        "user_id",
        F.date_trunc("second", "signup_ts").alias("signup_at"),
        F.date_trunc("second", "view_ts").alias("first_view_at"),
        F.date_trunc("second", "purchase_ts").alias("first_purchase_at"),
        _delta(F.col("view_ts"), F.col("signup_ts")).alias("signup_to_view_seconds"),
        _delta(F.col("purchase_ts"), F.col("signup_ts")).alias("signup_to_purchase_seconds"),
        # wrapup_time=0-when-missing parity (reference events.js:203):
        F.coalesce(
            _delta(F.col("purchase_ts"), F.col("view_ts")), F.lit(0)
        ).alias("view_to_purchase_seconds"),
    )
