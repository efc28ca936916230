"""Latest-state-per-key (SCD-1 dimension) — SURVEY.md §2.1 S7 / §2.2 F8.

The reference mutates one row per worker in place, latest attributes win
(reference routes/events.js:225-256). Spark-first: the event log is the
source of truth and the dimension is a VIEW — ``row_number() = 1`` over a
descending event-time window. Deterministic (total tie-break), idempotent
under duplicate delivery, and exactly the shape AQE compiles to one
shuffle + one sorted pass per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table


def latest_state(df: DataFrame, key: str, ts: str, order_tiebreak: str) -> DataFrame:
    """Keep the latest row per key (ts desc, tie-break desc — matching an
    upsert stream where the last-arriving event wins)."""
    w = W.partitionBy(key).orderBy(F.col(ts).desc(), F.col(order_tiebreak).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_state(df: DataFrame, key: str, ts: str, order_tiebreak: str) -> DataFrame:
    """First row per key — e.g. date_joined = ts of worker.created (S7)."""
    w = W.partitionBy(key).orderBy(F.col(ts), F.col(order_tiebreak))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def user_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 current-state dimension: latest event per user + lifecycle
    columns (first_seen ~ date_joined, reference events.js:230-246)."""
    ev = load_table(spark, "events", sf_dir)
    w_all = W.partitionBy("user_id")
    enriched = ev.withColumn("first_ts", F.min("ts").over(w_all)).withColumn(
        "n_events", F.count(F.lit(1)).over(w_all)
    )
    latest = latest_state(enriched, key="user_id", ts="ts", order_tiebreak="event_id")
    return latest.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.date_trunc("second", "ts").alias("last_seen"),
        F.date_trunc("second", "first_ts").alias("first_seen"),
        "n_events",
        F.col("value").alias("last_value"),
    )


def user_current_state_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof formulation of the same SCD-1 view: max_by/min over
    one hash aggregate instead of a window sort. The aggregate
    partial-combines map-side, so a hot user_id reduces to one state
    per input partition before the shuffle — no single giant sorted
    partition (the residual window-skew risk at 100 TB). Same rows
    as user_current_state."""
    ev = load_table(spark, "events", sf_dir)
    ord_ = F.struct("ts", "event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", ord_).alias("last_event_type"),
        F.date_trunc("second", F.max("ts")).alias("last_seen"),
        F.date_trunc("second", F.min("ts")).alias("first_seen"),
        F.count(F.lit(1)).alias("n_events"),
        F.max_by("value", ord_).alias("last_value"),
    )


_UCS_WINDOW_ORACLE = """
        SELECT
          user_id,
          last_event_type,
          date_trunc('second', last_ts) AS last_seen,
          date_trunc('second', first_ts) AS first_seen,
          n_events,
          CAST(last_value AS DOUBLE) AS last_value
        FROM (
          SELECT
            user_id,
            event_type AS last_event_type,
            ts AS last_ts,
            value AS last_value,
            MIN(ts) OVER (PARTITION BY user_id) AS first_ts,
            COUNT(*) OVER (PARTITION BY user_id) AS n_events,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        )
        WHERE rn = 1
"""

_UCS_MAXBY_ORACLE = """
        -- DuckDB arg_max takes no struct ordering: build a lexicographic
        -- (ts, event_id) key instead — exact same total order as Spark's
        -- max_by(col, struct(ts, event_id))
        WITH keyed AS (
          SELECT *,
            strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
              || '|' || lpad(CAST(event_id AS VARCHAR), 20, '0') AS ord_key
          FROM events
        )
        SELECT
          user_id,
          arg_max(event_type, ord_key) AS last_event_type,
          date_trunc('second', MAX(ts)) AS last_seen,
          date_trunc('second', MIN(ts)) AS first_seen,
          COUNT(*) AS n_events,
          CAST(arg_max(value, ord_key) AS DOUBLE) AS last_value
        FROM keyed
        GROUP BY user_id
"""


@register(
    "user_current_state",
    oracle=f"""
        SELECT 'window' AS variant, * FROM ({_UCS_WINDOW_ORACLE})
        UNION ALL
        SELECT 'maxby' AS variant, * FROM ({_UCS_MAXBY_ORACLE})
    """,
    doc=(
        "SCD-1 current-state dimension (S7/F8, reference events.js:230-246) "
        "in BOTH physical strategies, union-tagged by `variant`: the "
        "window/row_number form and the skew-proof max_by hash-aggregate "
        "form. One oracle row set per variant — the driver therefore checks "
        "each strategy independently AND that they agree."
    ),
)
def user_current_state_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = user_current_state(spark, sf_dir).select(F.lit("window").alias("variant"), "*")
    b = user_current_state_maxby(spark, sf_dir).select(F.lit("maxby").alias("variant"), "*")
    return a.unionByName(b)
