"""As-of join (time-travel point lookup) — SURVEY.md §2.2 F6 / §2.4 D1.

The reference answers "latest entry event with ts < exit ts for this key"
with a per-event full scan (reference routes/events.js:74-87, O(n) each).
Spark-first formulation: union the entry and exit streams, ONE window
ordered by event time per key, and carry the last-seen entry timestamp
forward with ``last(..., ignorenulls=True)``. One shuffle on the key,
no range join, no O(n²) — this survives 100 TB because each key's
timeline is processed in a single sorted pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exprs import epoch_seconds
from ..registry import register
from ..sources.tables import load_table


def asof_pair(
    df: DataFrame,
    key: str,
    ts: str,
    is_entry: Column,
    is_exit: Column,
    order_tiebreak: str,
    entry_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Attach the latest prior (or same-instant, earlier in tie-break order)
    entry row's timestamp/columns to each exit row.

    Returns the exit rows with `entry_ts` plus any requested `entry_cols`
    carried as-of. Rows that are neither entry nor exit are ignored.

    Parity note: this is the generalized form of the reference's
    ``getQueueEntryEventByTaskExitTime`` (events.js:74-87), where the
    "only one reservation in queue at a time" invariant makes
    last-entry-before-exit the correct pairing.
    """
    entry_cols = entry_cols or {}
    tagged = df.filter(is_entry | is_exit).withColumn("__is_entry", is_entry)
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts), F.col(order_tiebreak))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = tagged.withColumn(
        "entry_ts",
        F.last(F.when(F.col("__is_entry"), F.col(ts)), ignorenulls=True).over(w),
    )
    for name, col in entry_cols.items():
        carried = carried.withColumn(
            name,
            F.last(F.when(F.col("__is_entry"), col), ignorenulls=True).over(w),
        )
    return carried.filter(~F.col("__is_entry")).drop("__is_entry")


@register(
    "asof_view_to_purchase",
    oracle="""
        SELECT event_id, user_id, ts_sec, entry_ts_sec, wait_seconds
        FROM (
          SELECT
            event_id,
            user_id,
            event_type,
            date_trunc('second', ts) AS ts_sec,
            date_trunc('second',
              MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
                PARTITION BY user_id
                ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              )) AS entry_ts_sec,
            CAST(epoch(date_trunc('second', ts)) AS BIGINT)
              - CAST(epoch(date_trunc('second',
                  MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
                    PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                  ))) AS BIGINT) AS wait_seconds
          FROM events
          WHERE event_type IN ('view', 'purchase')
        )
        WHERE event_type = 'purchase'
    """,
    doc=(
        "As-of join D1 analog: for every purchase, seconds since the user's "
        "latest prior view (queue_time semantics incl. ms truncation P10)."
    ),
)
def asof_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    paired = asof_pair(
        ev,
        key="user_id",
        ts="ts",
        is_entry=F.col("event_type") == "view",
        is_exit=F.col("event_type") == "purchase",
        order_tiebreak="event_id",
    )
    return paired.select(
        "event_id",
        "user_id",
        F.date_trunc("second", "ts").alias("ts_sec"),
        F.date_trunc("second", "entry_ts").alias("entry_ts_sec"),
        (epoch_seconds(F.col("ts")) - epoch_seconds(F.col("entry_ts"))).alias("wait_seconds"),
    )
