"""Distributed synthetic TaskRouter load (the scale-path fixture).

The literal fixture (fixture.py) proves semantics; this module proves
throughput: N happy-path conversations generated DISTRIBUTIVELY from
``spark.range`` (never a driver-side literal list), pushed through the
full ingest → correlate → project pipeline. Every event timing is a
closed-form function of the task index, so the expected segment table
is computable in plain SQL — the scale run keeps a full hash oracle.

Per task i (all ms offsets exercise P10 truncation):
  task-queue.entered   at T0 + 60·i + 0.100s
  reservation.created  at T0 + 60·i + 5.900s    (RS-i, worker WK-(i%50))
  reservation.accepted at T0 + 60·i + 15.400s
  reservation.wrapup   at T0 + 60·i + 315.800s
  reservation.completed at T0 + 60·i + 360.200s
→ QUEUE  (queue_time 15, dated at entry)
→ CONVERSATION (queue 15, ring 10, talk 300, wrapup 45, dated at accept)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH_S = 1_717_200_000  # 2024-06-01T00:00:00Z
SPACING_S = 60

# (eventtype, offset_ms within the task, arrival slot)
_EVENT_SPECS = [
    ("task-queue.entered", 100, 0),
    ("reservation.created", 5_900, 1),
    ("reservation.accepted", 15_400, 2),
    ("reservation.wrapup", 315_800, 3),
    ("reservation.completed", 360_200, 4),
]

_TASK_ATTRS_JSON = '{"direction":"inbound","from":"+15550000","to":"+15551111"}'


def synthetic_events(
    spark: SparkSession, n_tasks: int, num_partitions: int | None = None
) -> DataFrame:
    """(arrival_idx, raw CloudEvent JSON) for n_tasks happy-path
    conversations — generated executor-side, ONE narrow stage: the five
    per-task events come from one explode over the spec array (an
    earlier 5-way union of range scans scheduled 5× the tasks for the
    same rows).

    ``num_partitions`` overrides the default sizing when the CALLER
    owns the layout: ``spark.range`` partitions are contiguous id
    ranges and explode preserves per-partition row order, so partition
    k is a complete, arrival-ordered slice of tasks — writing at
    ``num_partitions=K`` yields K event-time-ordered files with NO
    shuffle (the streaming scale certificate's spool: a
    repartitionByRange of the same 5M rows cost a 2 GB shuffle whose
    16 concurrent fetch+write tasks OOMed a warmed 1g driver-contract
    JVM — ordering that is free by construction should never be
    re-bought with a shuffle)."""
    from ..session import scale_input_partitions

    base = spark.range(
        0, n_tasks, 1,
        numPartitions=num_partitions or scale_input_partitions(spark),
    ).select(F.col("id").alias("i"))
    specs = F.array(
        *[
            F.struct(
                F.lit(et).alias("et"),
                F.lit(off_ms).alias("off_ms"),
                F.lit(slot).alias("slot"),
            )
            for et, off_ms, slot in _EVENT_SPECS
        ]
    )
    ev = base.select("i", F.explode(specs).alias("s"))
    i, et, slot = F.col("i"), F.col("s.et"), F.col("s.slot")
    ts = F.date_format(
        F.timestamp_millis(
            (F.lit(BASE_EPOCH_S) + i * SPACING_S) * 1000 + F.col("s.off_ms")
        ),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
    )
    payload = F.struct(
        et.alias("eventtype"),
        ts.alias("timestamp"),
        F.concat(F.lit("TKS-"), i).alias("task_sid"),
        F.concat(F.lit("RSS-"), i).alias("reservation_sid"),
        F.concat(F.lit("WKS-"), i % 50).alias("worker_sid"),
        F.lit(_TASK_ATTRS_JSON).alias("task_attributes"),
        F.lit("voice").alias("task_channel_unique_name"),
        F.lit("Main").alias("workflow_name"),
        F.lit("Support").alias("task_queue_name"),
        F.lit("WQ-1").alias("task_queue_sid"),
    )
    envelope = F.struct(
        F.concat(F.lit("EV-"), slot, F.lit("-"), i).alias("id"),
        F.concat(F.lit("com.twilio.taskrouter."), et).alias("type"),
        F.struct(payload.alias("payload")).alias("data"),
    )
    return ev.select(
        (i * len(_EVENT_SPECS) + slot).alias("arrival_idx"),
        F.to_json(envelope).alias("raw"),
    )


def scale_oracle_sql(n_tasks: int) -> str:
    """Closed-form expected segments (DuckDB): 2 rows per task."""
    return f"""
        WITH t AS (SELECT range AS i FROM range({n_tasks})),
        base AS (
          -- naive TIMESTAMP arithmetic: to_timestamp() would yield
          -- TIMESTAMPTZ and tz-render differently from Spark's naive UTC
          SELECT i,
                 TIMESTAMP '2024-06-01 00:00:00'
                   + i * INTERVAL {SPACING_S} SECOND AS entry_ts,
                 TIMESTAMP '2024-06-01 00:00:00'
                   + i * INTERVAL {SPACING_S} SECOND + INTERVAL 15 SECOND AS accept_ts
          FROM t
        )
        SELECT 'QUEUE' AS segment_kind,
               'TKS-' || i AS conversation_id,
               'RSS-' || i AS reservation_sid,
               'WKS-' || (i % 50) AS agent_uuid,
               entry_ts AS "date",
               CAST(15 AS BIGINT) AS queue_time,
               CAST(NULL AS BIGINT) AS ring_time,
               CAST(NULL AS BIGINT) AS talk_time,
               CAST(NULL AS BIGINT) AS wrapup_time
        FROM base
        UNION ALL
        SELECT 'CONVERSATION',
               'TKS-' || i,
               'RSS-' || i,
               'WKS-' || (i % 50),
               accept_ts,
               CAST(15 AS BIGINT),
               CAST(10 AS BIGINT),
               CAST(300 AS BIGINT),
               CAST(45 AS BIGINT)
        FROM base
    """
