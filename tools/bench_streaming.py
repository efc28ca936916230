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

Every published throughput is a MEDIAN of SPARK_GRAFT_STREAM_REPEATS
(default 3) independent runs with the min/max spread alongside —
single streaming runs swing ±2x on identical code (r10 record), so a
single-run artifact cannot be read round-over-round.

Run: python tools/bench_streaming.py
Env: SPARK_GRAFT_STREAM_TASKS (default 200000 -> 1M events),
     SPARK_GRAFT_CPUS (session parallelism, default 32),
     SPARK_GRAFT_STREAM_REPEATS (default 3 -> median + spread).
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


def spool_sparse_touch(spark, outdir: str, n_dormant: int, n_active: int,
                       n_batches: int, pad_len: int = 2000) -> int:
    """Sparse-touch corpus: ``n_dormant`` tasks open (entered/
    created/accepted) in batch 0 with FAT attributes (``pad_len`` bytes, default ~2 KB) and
    never move again inside the run's event-time horizon, while
    ``n_active`` tasks run full 5-event lifecycles spread over
    the remaining batches. Every micro-batch touches nearly
    every shard, but only the active tasks' state changes — the
    shape where the blob shard re-serializes all co-resident
    dormant fat state per batch and MapState rewrites only the
    touched entries. Returns total event count."""
    from pyspark.sql import functions as F

    from twilio_event_streams_reporting_example_spark.session import (
        scale_input_partitions,
    )
    from twilio_event_streams_reporting_example_spark.taskrouter.scale import (
        BASE_EPOCH_S,
    )

    fat = json.dumps(
        {"direction": "inbound", "pad": "x" * pad_len,
         "conversations": {"channel": "Call"}}
    )
    np_ = scale_input_partitions(spark)

    def emit(df, batch_idx):
        path = os.path.join(outdir, f"b{batch_idx:03d}")
        # 8 files per batch dir + maxFilesPerTrigger=8 in the
        # reader => one micro-batch per dir, deterministically
        df.coalesce(8).write.text(path)
        mt = 1_700_000_000 + batch_idx * 10
        for fn_ in os.listdir(path):
            p = os.path.join(path, fn_)
            os.utime(p, (mt, mt))

    def payload(i, et, ts_expr, slot):
        p = F.struct(
            F.lit(et).alias("eventtype"),
            F.date_format(ts_expr, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias(
                "timestamp"
            ),
            F.concat(F.lit("SPT-"), i).alias("task_sid"),
            F.concat(F.lit("SPR-"), i).alias("reservation_sid"),
            F.concat(F.lit("SPW-"), i % 50).alias("worker_sid"),
            F.lit(fat).alias("task_attributes"),
            F.lit("voice").alias("task_channel_unique_name"),
            F.lit("Main").alias("workflow_name"),
            F.lit("Support").alias("task_queue_name"),
            F.lit("WQ-1").alias("task_queue_sid"),
        )
        env = F.struct(
            F.concat(F.lit(f"SP-{et}-{slot}-"), i).alias("id"),
            F.lit(f"com.twilio.taskrouter.{et}").alias("type"),
            F.struct(p.alias("payload")).alias("data"),
        )
        return F.to_json(env)

    # batch 0: dormant opens (3 events each, second-spread)
    d = spark.range(0, n_dormant, 1, numPartitions=np_).select(
        F.col("id").alias("i")
    )
    i = F.col("i")
    t0 = F.timestamp_millis((F.lit(BASE_EPOCH_S)) * 1000 + i % 60_000)
    rows = None
    for slot, (et, off) in enumerate(
        [("task-queue.entered", 0), ("reservation.created", 500),
         ("reservation.accepted", 1500)]
    ):
        part = d.select(
            payload(
                i, et,
                F.timestamp_millis(
                    F.lit(BASE_EPOCH_S * 1000) + i % 60_000 + off
                ),
                slot,
            ).alias("value")
        )
        rows = part if rows is None else rows.unionByName(part)
    emit(rows, 0)

    # batches 1..n: active lifecycles, each task fully inside its
    # batch window (window w starts at +90s + w*20s — inside the
    # dormant deadlines' 10-minute horizon, so dormant state stays
    # resident the whole run)
    per = max(1, n_active // (n_batches - 1))
    for b in range(1, n_batches):
        lo, hi = (b - 1) * per, min(b * per, n_active)
        if lo >= hi:
            break
        a = spark.range(n_dormant + lo, n_dormant + hi, 1,
                        numPartitions=np_).select(F.col("id").alias("i"))
        base_ms = (BASE_EPOCH_S + 90 + (b - 1) * 20) * 1000
        rows = None
        for slot, (et, off) in enumerate(
            [("task-queue.entered", 0), ("reservation.created", 200),
             ("reservation.accepted", 900),
             ("reservation.completed", 4000),
             ("reservation.wrapup", 5000)]
        ):
            part = a.select(
                payload(
                    F.col("i"), et,
                    F.timestamp_millis(
                        F.lit(base_ms) + (F.col("i") % 1000) + off
                    ),
                    slot,
                ).alias("value")
            )
            rows = part if rows is None else rows.unionByName(part)
        emit(rows, b)
    return n_dormant * 3 + n_active * 5


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

    def _progress_stats(q) -> dict:
        """p50/p95 micro-batch duration + event-time watermark lag from
        the query's progress history (r7 VERDICT ask: throughput alone
        hides emission latency at 100x). Watermark lag = eventTime.max
        - eventTime.watermark per batch: how far emission trails the
        newest data in EVENT time — watermark delay + batch
        granularity — the right latency notion for a replay bench
        (wall-clock lag is meaningless against synthetic timestamps)."""
        import datetime as dt

        durs: list[float] = []
        lags: list[float] = []
        maxes: list[float] = []
        for p in q.recentProgress:
            if not isinstance(p, dict):  # StreamingQueryProgress object
                p = json.loads(p.json)
            d = (p.get("durationMs") or {}).get("triggerExecution")
            if d is not None:
                durs.append(float(d))
            et = p.get("eventTime") or {}
            if "watermark" in et and "max" in et:
                try:
                    mx = dt.datetime.fromisoformat(et["max"].replace("Z", "+00:00"))
                    wm = dt.datetime.fromisoformat(
                        et["watermark"].replace("Z", "+00:00")
                    )
                    # the first batch reports the UNINITIALIZED epoch-0
                    # watermark — a meaningless ~56-year lag; skip it
                    if wm.timestamp() > 0:
                        lags.append((mx - wm).total_seconds() * 1000.0)
                        maxes.append(mx.timestamp() * 1000.0)
                except ValueError:
                    pass

        def pct(xs: list[float], f: float):
            if not xs:
                return None
            xs = sorted(xs)
            return round(xs[min(len(xs) - 1, int(f * len(xs)))], 1)

        # Lag in units of per-batch EVENT-TIME span: a synthetic replay
        # compresses days of event time into seconds of wall clock, so
        # raw ms lag scales with the generator's timestamp spacing, not
        # with the engine. Normalized, p50 ≈ 1 batch-span is the
        # availableNow ideal (batch k's watermark derives from batch
        # k-1's max); a growing value means the watermark is falling
        # behind the replay.
        span = (
            (maxes[-1] - maxes[0]) / (len(maxes) - 1)
            if len(maxes) >= 2
            else None
        )
        lag_norm = [lag / span for lag in lags] if span else []
        # The raw ms lag is deliberately NOT published: against a
        # synthetic historical replay it reads as ~10^8 ms (days of
        # compressed event time vs wall clock) — a number every reader
        # misinterprets as real lag. Only the normalized batch-span
        # metric is meaningful here (1.0 = availableNow ideal).
        return {
            "n_batches": len(durs),
            "batch_ms_p50": pct(durs, 0.5),
            "batch_ms_p95": pct(durs, 0.95),
            "watermark_lag_batches_p50": pct(lag_norm, 0.5),
            "watermark_lag_batches_p95": pct(lag_norm, 0.95),
        }

    try:
        indir = os.path.join(work, "in")
        # executor-side spool: the generator never touches the driver
        synthetic_events(spark, n_tasks).select("raw").write.text(indir)

        ordered_dir: list = []  # lazy one-shot time-ordered spool

        def _ordered_spool() -> str:
            """Time-ordered 16-file spool for the lag probes: event time
            is monotone in arrival_idx, so a range repartition + per-file
            ascending mtimes makes the file source replay micro-batches
            in EVENT-TIME order (maxFilesPerTrigger=1 → 16 batches). The
            original unordered spool made watermark lag meaningless —
            batches mixed old and new files, so max(eventTime) −
            watermark swung hugely negative/positive."""
            if not ordered_dir:
                d = os.path.join(work, "in_ordered")
                (
                    synthetic_events(spark, n_tasks)
                    .repartitionByRange(16, "arrival_idx")
                    .sortWithinPartitions("arrival_idx")
                    .select("raw")
                    .write.text(d)
                )
                parts = sorted(
                    f for f in os.listdir(d) if f.startswith("part-")
                )
                for k, fn in enumerate(parts):
                    mt = 1_700_000_000 + k * 10
                    os.utime(os.path.join(d, fn), (mt, mt))
                ordered_dir.append(d)
            return ordered_dir[0]

        # Per-pipeline run-to-run spread is real and large (round-10
        # record: TWS 10.3k vs 23.7k events/s back to back) — a single
        # run is unreadable as a trend, so every published throughput is
        # the MEDIAN of ``repeats`` independent availableNow runs (fresh
        # checkpoint each: reusing one would resume and process nothing)
        # with the min/max published alongside (r10 VERDICT item 4).
        repeats = max(1, int(os.environ.get("SPARK_GRAFT_STREAM_REPEATS", "3")))

        def _timed_runs(name: str, build, make_source, n_ev: int) -> dict:
            """``repeats`` timed runs → median sec + spread + the last
            run's progress stats (cadence percentiles are stable across
            runs; only wall time swings)."""
            secs: list[float] = []
            stats: dict = {}
            for r in range(repeats):
                ck = os.path.join(work, f"ck_{name}_r{r}")
                t0 = time.perf_counter()
                q = (
                    build(parse_stream(make_source()))
                    .writeStream.format("noop")
                    .option("checkpointLocation", ck)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                secs.append(round(time.perf_counter() - t0, 3))
                stats = _progress_stats(q)
            s = sorted(secs)
            med = s[len(s) // 2]
            return {
                "n_events": n_ev,
                "sec": med,
                "sec_runs": secs,
                "sec_min": s[0],
                "sec_max": s[-1],
                "events_per_sec": round(n_ev / med, 1),
                **stats,
            }

        def run(name: str, build, lag_probe: bool = False):
            """Median-of-``repeats`` single-batch availableNow runs for
            the round-over-round throughput number; when ``lag_probe``
            is set, ONE extra run of the same pipeline over the
            TIME-ORDERED spool (16 event-time-ordered micro-batches)
            fills the pipeline's watermark-lag percentiles — the single
            giant batch yields no watermark trajectory, so lag was
            structurally null exactly where throughput was measured
            (r8 VERDICT item 4). The probe's own cadence stats are kept
            under ``lag_probe``; sec/events_per_sec stay the comparable
            single-batch medians."""
            rec = _timed_runs(
                name, build,
                lambda: spark.readStream.format("text").load(indir),
                n_events,
            )
            if lag_probe:
                ckp = os.path.join(work, f"ck_{name}_lagprobe")
                rawp = (
                    spark.readStream.format("text")
                    .option("maxFilesPerTrigger", 1)
                    .load(_ordered_spool())
                )
                t0 = time.perf_counter()
                qp = (
                    build(parse_stream(rawp))
                    .writeStream.format("noop")
                    .option("checkpointLocation", ckp)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .start()
                )
                qp.awaitTermination()
                psec = round(time.perf_counter() - t0, 3)
                pstats = _progress_stats(qp)
                for k in (
                    "watermark_lag_batches_p50", "watermark_lag_batches_p95",
                ):
                    rec[k] = pstats[k]
                rec["lag_probe"] = {
                    "sec": psec,
                    "events_per_sec": round(n_events / psec, 1),
                    **pstats,
                }
            pipelines[name] = rec


        def run_sparse(name: str, build, indir: str, n_events: int):
            pipelines[name] = _timed_runs(
                name, build,
                lambda: (
                    spark.readStream.format("text")
                    .option("maxFilesPerTrigger", 8)
                    .load(os.path.join(indir, "b*"))
                ),
                n_events,
            )

        run("lifecycle", conversation_segments_stream)
        run(
            "lifecycle_bucketed",
            lambda ev: conversation_segments_stream(ev, buckets=1024),
            lag_probe=True,
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
        # sparse-touch: dormant fat state + active minority per batch —
        # the shape where per-entry MapState beats the whole-shard blob
        sp_dormant = int(os.environ.get("SPARK_GRAFT_SPARSE_DORMANT", "50000"))
        sp_active = int(os.environ.get("SPARK_GRAFT_SPARSE_ACTIVE", "10000"))
        sp_dir = os.path.join(work, "sparse_in")
        sp_events = spool_sparse_touch(spark, sp_dir, sp_dormant, sp_active, 20)
        run_sparse(
            "lifecycle_sparse_touch",
            lambda ev: conversation_segments_stream(ev, buckets=1024),
            sp_dir,
            sp_events,
        )
        prev_provider = spark.conf.get(provider_key, None)
        try:
            spark.conf.set(
                provider_key,
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            run_sparse(
                "lifecycle_sparse_touch_tws",
                lambda ev: conversation_segments_stream(ev, buckets=1024, tws=True),
                sp_dir,
                sp_events,
            )
        finally:
            if prev_provider is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, prev_provider)
        run("hourly_window", hourly_event_counts_stream, lag_probe=True)

        # The round-15 streaming scale CERTIFICATE path, measured: the
        # exact harness behind the registered `bucketed_scale` oracle
        # section (ordered 8-batch replay, RocksDB state, durable
        # parquet sink, distributive summary) at its certification
        # volume — wall time covers generate+spool+stream+sink+reduce,
        # so events/s here is END-TO-END, not the stateful stage alone
        # (the `lifecycle_bucketed` row remains the stage-isolated
        # number). Median of the same ``repeats`` as every other row.
        from twilio_event_streams_reporting_example_spark.plans.taskrouter_queries import (
            SCALE_STREAM_TASKS,
            _scale_stream_summary_golden_rows,
            scale_stream_summary,
        )

        cert_tasks = int(
            os.environ.get(
                "SPARK_GRAFT_STREAM_CERT_TASKS", str(SCALE_STREAM_TASKS)
            )
        )
        cert_secs: list[float] = []
        verified = False
        for _ in range(repeats):
            t0 = time.perf_counter()
            got = {
                r["segment_kind"]: r.asDict()
                for r in scale_stream_summary(spark, n_tasks=cert_tasks).collect()
            }
            cert_secs.append(round(time.perf_counter() - t0, 3))
            want = {
                r["segment_kind"]: r
                for r in _scale_stream_summary_golden_rows(cert_tasks)
            }
            verified = sorted(got) == sorted(want) and all(
                got[k][c] == v for k, w in want.items()
                for c, v in w.items() if c != "keying"
            )
        s = sorted(cert_secs)
        med = s[len(s) // 2]
        pipelines["scale_certificate_e2e"] = {
            "n_events": cert_tasks * 5,
            "sec": med,
            "sec_runs": cert_secs,
            "sec_min": s[0],
            "sec_max": s[-1],
            "events_per_sec": round(cert_tasks * 5 / med, 1),
            "summary_matches_closed_form": verified,
        }
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
