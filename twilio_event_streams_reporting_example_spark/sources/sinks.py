"""Materialization sinks (S4/S5): the durable storage story.

The reference keeps everything in a volatile in-memory store (LokiJS
without an adapter, app.js:13 — data lost on restart, README.md:13).
The engine materializes three tables as parquet:

  event log  (S4) — append-only source of truth, partitioned by event
               date: a recompute or a point investigation prunes to the
               days it needs (reference caches every taskrouter event,
               events.js:488-500, but cannot survive a restart).
  segments   (S5) — the conversations fact, partitioned by segment date
               (the natural report filter).
  agents     — the small current-state dimension, single partition
               (broadcast-side at query time).

At 100 TB the event log is the big table; date partitioning plus
parquet min-max on the sid columns replaces the reference's LokiJS
indices (SURVEY §4). Writes use dynamic partition overwrite so an
incremental daily recompute replaces only the affected days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_event_log(parsed: DataFrame, path: str) -> None:
    """S4: append-only raw event log, date-partitioned."""
    (
        parsed.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )


def write_segments(segments: DataFrame, path: str) -> None:
    """S5: conversations fact, partitioned by segment date.

    The row id (P12, reference events.js:217 ``uuid()``) is minted at
    write time — the queryable views stay deterministic (oracle-
    hashable); only durable rows carry the synthetic key."""
    (
        segments.withColumn("uuid", F.expr("uuid()"))
        .withColumn("segment_date", F.to_date("date"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment_date")
        .parquet(path)
    )


def write_agents(agents: DataFrame, path: str) -> None:
    """Current-state dimension: small, one file, broadcast at read time."""
    agents.coalesce(1).write.mode("overwrite").parquet(path)


def materialize_taskrouter(spark: SparkSession, raw: DataFrame, base_dir: str) -> dict[str, str]:
    """Full materialization pass: event log + fact + dimension.

    Returns the written paths. The fact/dim recompute reads the same
    parsed log the event-log sink wrote — one parse, three writes."""
    from ..plans.taskrouter import (
        ingest_taskrouter,
        taskrouter_agents_df,
        taskrouter_segments_df,
    )

    paths = {
        "event_log": f"{base_dir}/event_log",
        "segments": f"{base_dir}/segments",
        "agents": f"{base_dir}/agents",
    }
    write_event_log(ingest_taskrouter(raw), paths["event_log"])
    write_segments(taskrouter_segments_df(spark, raw), paths["segments"])
    write_agents(taskrouter_agents_df(spark, raw), paths["agents"])
    return paths
