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


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) + per-session aggregates."""
    ev = load_table(spark, "events", sf_dir)
    sessions = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
    return sessions.groupBy("user_id", "session_idx").agg(
        F.date_trunc("second", F.min("ts")).alias("session_start"),
        F.date_trunc("second", F.max("ts")).alias("session_end"),
        (epoch_seconds(F.max("ts")) - epoch_seconds(F.min("ts"))).alias("duration_seconds"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


_INTERVALS_ORACLE = """
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
"""


def activity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval sessionization per the agent-status state machine
    (SURVEY §2.5): each event opens an interval closed by the next
    event of the same key; the last interval stays IN PROGRESS
    (reference events.js:639-664 recast as lead() — no mutation)."""
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


def sessionize_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 30-min gap sessions through Spark's NATIVE session_window
    operator (one merging-aggregation instead of window + running
    sum — and the formulation that transfers 1:1 to Structured
    Streaming's merging session state). Timestamps are second-
    truncated first; Spark's session_window merges INCLUSIVELY at
    the gap boundary (diff == gap merges, verified by probe), so a
    1800s gap equals the hand-rolled '<=1800s whole-second' rule.
    ``session_idx`` (1-based per user, by start time) is recovered with
    a row_number over SESSION rows — a window over the already-reduced
    aggregate output, not over raw events."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "tts", F.date_trunc("second", "ts")
    )
    sessions = (
        ev.groupBy("user_id", F.session_window("tts", "1800 seconds"))
        .agg(
            F.min("tts").alias("session_start"),
            F.max("tts").alias("session_end"),
            (epoch_seconds(F.max("tts")) - epoch_seconds(F.min("tts"))).alias(
                "duration_seconds"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .drop("session_window")
    )
    w = W.partitionBy("user_id").orderBy("session_start")
    return sessions.withColumn("session_idx", F.row_number().over(w).cast("long"))


_GAP_SESSIONS_ORACLE = """
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
"""


@register(
    "sessionize_events",
    oracle=f"""
        SELECT 'running_sum' AS variant, * FROM ({_GAP_SESSIONS_ORACLE})
        UNION ALL
        SELECT 'session_window' AS variant, * FROM ({_GAP_SESSIONS_ORACLE})
    """,
    doc=(
        "Gap-based sessionization (30 min) + per-session aggregates in BOTH "
        "physical strategies, union-tagged by `variant`: the hand-rolled "
        "lag/running-sum window form and Spark's native session_window "
        "merging aggregation. Both variants share ONE oracle derivation "
        "(the lag/running-sum SQL), so the driver checks each against the "
        "oracle and, transitively, against the other."
    ),
)
def sessionize_events_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = sessionize_events(spark, sf_dir).select(F.lit("running_sum").alias("variant"), "*")
    b = sessionize_builtin(spark, sf_dir).select(F.lit("session_window").alias("variant"), "*")
    return a.unionByName(b)


_SESSIONS_ORACLE = """
        SELECT
          user_id,
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
"""


@register(
    "streaming_user_sessions",
    bench=False,
    priority=0,  # streaming harness: keep inside the driver window
    oracle=_SESSIONS_ORACLE,
    doc=(
        "The 30-min sessions as a STREAMING query: the same session_window "
        "merging aggregation run under Structured Streaming (watermark + "
        "append mode, per-user merging session state, rows emitted once "
        "when the watermark closes them — a far-future advancer closes "
        "every real session deterministically). Same oracle as the batch "
        "sessionize_builtin: streaming/batch parity IS the claim."
    ),
)
def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..registry import pin_checkpoint
    from ..streaming.sessions import run_events_session_stream

    with tempfile.TemporaryDirectory() as d:
        out = run_events_session_stream(spark, d, sf_dir).localCheckpoint(eager=True)
    pin_checkpoint(out)  # released by release_caches() post-consume
    return out


# ----------------------------------------------- skew-hardened window lead

SALT_BUCKET_SECONDS = 6 * 3600  # time-salt width for hot-key windows


def lead_ts_salted(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    bucket_seconds: int = SALT_BUCKET_SECONDS,
) -> DataFrame:
    """``lead(ts) over (partition by key order by ts, tiebreak)`` without
    ever materializing one window partition per key — the salt-and-merge
    hardening for hot keys (a single user/task with millions of events
    would otherwise sort in ONE task; AQE skew handling does not split
    window exchanges).

    Two-phase plan:
      1. intra-bucket: the same lead, partitioned by (key, time-bucket) —
         partition size is bounded by events-per-key-per-bucket, so a hot
         key spreads across buckets instead of one giant sort;
      2. boundary merge: per (key, bucket) take the first (ts, tiebreak)
         event — a partial-aggregated min-struct — then a per-key lead
         over BUCKETS (≤ a few thousand rows per key, bounded by the time
         span, not the event count) supplies the next-bucket-first
         timestamp that closes each bucket's last row.

    Equivalent to the global window for every row: ties share a bucket
    (same ts → same bucket), and lead over non-empty buckets skips empty
    ones exactly like the row-level lead does. Adds ``next_ts``.
    """
    b = F.floor(epoch_seconds(F.col(ts)) / bucket_seconds)
    salted = df.withColumn("_tb", b)
    w_in = W.partitionBy(key, "_tb").orderBy(F.col(ts), F.col(tiebreak))
    intra = salted.withColumn("_next_intra", F.lead(ts).over(w_in))
    firsts = (
        salted.groupBy(key, "_tb")
        .agg(F.min(F.struct(F.col(ts), F.col(tiebreak))).alias("_s"))
        .select(key, "_tb", F.col(f"_s.{ts}").alias("_bucket_first_ts"))
    )
    w_b = W.partitionBy(key).orderBy("_tb")
    boundaries = firsts.withColumn(
        "_next_bucket_ts", F.lead("_bucket_first_ts").over(w_b)
    ).select(key, "_tb", "_next_bucket_ts")
    return (
        intra.join(boundaries, [key, "_tb"], "left")
        .withColumn("next_ts", F.coalesce("_next_intra", "_next_bucket_ts"))
        .drop("_tb", "_next_intra", "_next_bucket_ts")
    )


def activity_intervals_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """activity_intervals through the salt-and-merge window (hot-key
    hardening): the per-key lead is computed per (key, 6h-bucket)
    with a tiny per-key bucket-boundary merge, so no single window
    partition ever holds a whole hot key. Must be bit-identical to
    the global window."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("view", "click", "error")
    )
    out = lead_ts_salted(ev, key="user_id", ts="ts", tiebreak="event_id")
    return out.select(
        "user_id",
        F.col("event_type").alias("activity"),
        F.date_trunc("second", "ts").alias("started_at"),
        F.date_trunc("second", "next_ts").alias("ended_at"),
        (epoch_seconds(F.col("next_ts")) - epoch_seconds(F.col("ts"))).alias("activity_seconds"),
        F.col("next_ts").isNull().alias("in_progress"),
    )


@register(
    "activity_intervals",
    oracle=f"""
        SELECT 'global_window' AS variant, * FROM ({_INTERVALS_ORACLE})
        UNION ALL
        SELECT 'salted' AS variant, * FROM ({_INTERVALS_ORACLE})
    """,
    doc=(
        "Agent-status interval sessionization (SURVEY §2.5, reference "
        "events.js:639-664) in BOTH physical strategies, union-tagged by "
        "`variant`: the global per-key lead() window and the salt-and-merge "
        "hot-key-hardened form (per (key, 6h-bucket) lead + tiny boundary "
        "merge). One oracle derivation for both — the salted plan must be "
        "bit-identical to the global window."
    ),
)
def activity_intervals_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = activity_intervals(spark, sf_dir).select(F.lit("global_window").alias("variant"), "*")
    b = activity_intervals_salted(spark, sf_dir).select(F.lit("salted").alias("variant"), "*")
    return a.unionByName(b)
