"""Single-query iteration harness for the optimization rounds.

Times one or more registered queries exactly the way bench.py does
(build + noop-sink write, release_caches() between runs), but adds the
instrumentation the optimization guide asks for per query:

  - per-run wall seconds (cold + warm reps);
  - jobs/stages submitted during the run (statusTracker deltas) — the
    scheduler-floor signal behind PLANS #25;
  - optionally dumps ``.explain("formatted")`` of the built DataFrame
    to ``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt`` (default
    r16; ``--plans <tag>``).

Usage:
    python tools/bench_one.py q1 [q2 ...] [--reps N] [--plans before]
    python tools/bench_one.py --all --plans before   # every benched query

This is an iteration tool, not a record: it never writes BENCH_FULL.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    reps = 3
    plans_tag = None
    names: list[str] = []
    run_all = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif a == "--all":
            run_all = True; i += 1
        else:
            names.append(a); i += 1

    from twilio_event_streams_reporting_example_spark.registry import (
        all_queries,
        release_caches,
    )
    from twilio_event_streams_reporting_example_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_one")
    sc = spark.sparkContext
    specs = all_queries()
    if run_all:
        names = [n for n, s in sorted(specs.items()) if s.bench]
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1

    # warm-up outside timings (same as bench.py)
    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    )
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        spec = specs[name]
        runs: list[float] = []
        jobs_per_run: list[int] = []
        stages_per_run: list[int] = []
        for r in range(reps):
            group = f"{name}-rep{r}"
            sc.setJobGroup(group, f"{name} rep{r}")
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            if plans_tag and r == 0:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            tracker = sc.statusTracker()
            new_jobs = tracker.getJobIdsForGroup(group) or []
            n_stages = 0
            for jid in new_jobs:
                info = tracker.getJobInfo(jid)
                if info:
                    n_stages += len(info.stageIds)
            jobs_per_run.append(len(new_jobs))
            stages_per_run.append(n_stages)
            release_caches()
            spark.catalog.clearCache()
            sc.setJobGroup("idle", "idle")
        out[name] = {
            "runs": runs,
            "warm_min": min(runs[1:]) if len(runs) > 1 else runs[0],
            "jobs": jobs_per_run,
            "stages": stages_per_run,
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"summary": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
