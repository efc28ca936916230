"""Streaming throughput micro-bench (BENCH_STREAMING.json).

The batch registry bench (bench.py) covers every batch query; the seven
streaming harnesses are correctness-gated there (bench=False) and had no
recorded perf signal. This measures the two core streaming pipelines at
a synthetic-scale event count, executor-generated end to end:

  - lifecycle: N CloudEvents (taskrouter.scale.synthetic_events, the
    same closed-form happy-path generator the batch scale proof uses)
    spooled to JSON-line files executor-side, then
    parse_stream -> applyInPandasWithState conversation lifecycle ->
    noop sink, availableNow. Measures the stateful per-conversation
    correlation path (envelope parse, dedup state, Arrow group batches,
    python state machine, emit).
  - hourly_window: the SAME parsed stream through the watermark +
    tumbling-window aggregation (hourly_event_counts_stream) -> noop.
    Measures the pure-JVM windowed-agg path for contrast.

Prints ONE JSON line and writes BENCH_STREAMING.json at the repo root
(round-over-round comparable: fixed generator, fixed N per env knob).

Run: python tools/bench_streaming.py
Env: SPARK_GRAFT_STREAM_TASKS (default 200000 -> 1M events),
     SPARK_GRAFT_CPUS (session parallelism, default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from twilio_event_streams_reporting_example_spark.session import get_spark
    from twilio_event_streams_reporting_example_spark.streaming.taskrouter_stream import (
        conversation_segments_stream,
        hourly_event_counts_stream,
        parse_stream,
    )
    from twilio_event_streams_reporting_example_spark.taskrouter.scale import synthetic_events

    n_tasks = int(os.environ.get("SPARK_GRAFT_STREAM_TASKS", "200000"))
    n_events = n_tasks * 5
    spark = get_spark("bench-streaming")

    work = tempfile.mkdtemp(prefix="bench_streaming_")
    pipelines: dict[str, dict] = {}
    try:
        indir = os.path.join(work, "in")
        # executor-side spool: the generator never touches the driver
        synthetic_events(spark, n_tasks).select("raw").write.text(indir)

        def run(name: str, build):
            ck = os.path.join(work, f"ck_{name}")
            raw = spark.readStream.format("text").load(indir)
            t0 = time.perf_counter()
            q = (
                build(parse_stream(raw))
                .writeStream.format("noop")
                .option("checkpointLocation", ck)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            sec = round(time.perf_counter() - t0, 3)
            pipelines[name] = {
                "n_events": n_events,
                "sec": sec,
                "events_per_sec": round(n_events / sec, 1),
            }

        run("lifecycle", conversation_segments_stream)
        run(
            "lifecycle_bucketed",
            lambda ev: conversation_segments_stream(ev, buckets=1024),
        )
        # same bucket keying on transformWithStateInPandas with per-task
        # MapState (RocksDB rewrites only touched tasks, not the shard
        # blob) — TWS requires the RocksDB state store provider
        provider_key = "spark.sql.streaming.stateStore.providerClass"
        prev_provider = spark.conf.get(provider_key, None)
        try:
            spark.conf.set(
                provider_key,
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            run(
                "lifecycle_bucketed_tws",
                lambda ev: conversation_segments_stream(ev, buckets=1024, tws=True),
            )
        finally:
            if prev_provider is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, prev_provider)
        run("hourly_window", hourly_event_counts_stream)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    result = {
        "metric": "streaming_throughput",
        "unit": "events_per_sec",
        "n_tasks": n_tasks,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "pipelines": pipelines,
    }
    if os.environ.get("SPARK_GRAFT_BENCH_NO_ARTIFACT") != "1":
        with open(os.path.join(REPO, "BENCH_STREAMING.json"), "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
    try:
        spark.stop()
    except Exception:
        pass
    sys.stderr.flush()
    sys.stdout.write("\n" + json.dumps(result) + "\n")
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
