"""bench.py's stdout contract: the driver machine-reads ONE JSON line
(metric/value/unit/queries/sf). A progress-bar fragment glued onto the
line, a missing field, or a non-JSON tail breaks the round's BENCH
artifact silently — this runs the real subprocess at the smallest SF."""

import json
import os
import subprocess
import sys


def test_bench_emits_one_parseable_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_NO_ARTIFACT="1",  # don't clobber BENCH_FULL.json
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert lines, "no stdout"
    d = json.loads(lines[-1])
    assert d["metric"] == "total_query_wall_time"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] >= 0
    assert d["sf"] == 0.001
    assert d["queries"] and all(isinstance(v, (int, float)) for v in d["queries"].values())
    errored = [k for k, v in d["queries"].items() if v < 0]
    assert not errored, f"queries errored at sf0.001: {errored}"
    assert d["runs"] and all(len(v) >= 1 for v in d["runs"].values())
