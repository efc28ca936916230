"""Pre-snapshot gate: refuse an end-of-round snapshot on a red tree.

Round-7 lesson: an 853-line feature (the JPEG codec) landed in the
final end-of-round snapshot commit without a full-suite run, leaving
two stale assertions red for the whole round's audit. This script is
the gate: run it BEFORE the last commit of a round (and before any
"snapshot" commit). It runs

  1. the full pytest suite (``pytest tests/ -q``), and
  2. the oracle compare for every registered query at sf0.001
     (``tools/check_queries.py --all``),

and exits non-zero if either is red — so the final commit of a round
can only ever be docs/artifacts on a green tree.

Usage:  python tools/pre_snapshot_gate.py [sf_dir]
Exit:   0 = green, safe to snapshot; 1 = RED, do not snapshot.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(label: str, cmd: list[str]) -> bool:
    print(f"[gate] {label}: {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    rc = subprocess.call(cmd, cwd=REPO)
    dt = time.perf_counter() - t0
    status = "GREEN" if rc == 0 else f"RED (rc={rc})"
    print(f"[gate] {label}: {status} in {dt:.1f}s", flush=True)
    return rc == 0


def fast_contract_check() -> bool:
    """The ALWAYS-ON <60s path (round-12 lesson: the full 35-min gate
    was skipped under turn pressure and an entry-point NameError
    reached the snapshot, zeroing the driver board). Runs the entry
    contract smoke — queries()/oracle_sql() shape + worker-side spec
    materialization — with no SparkSession. Run this even when the
    full gate is consciously skipped."""
    return _run(
        "fast-contract",
        [
            sys.executable, "-m", "pytest",
            "tests/test_entry_contract.py", "-q",
        ],
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    if not fast_contract_check():
        print("[gate] RED (fast contract) — do NOT snapshot")
        return 1
    if "--fast-only" in sys.argv:
        print("[gate] fast contract GREEN (--fast-only; full gate skipped)")
        return 0
    ok = _run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    # run the oracle gate even if pytest is red: a snapshot decision
    # wants the full picture, not the first failure
    ok &= _run(
        "oracle-compare",
        [sys.executable, "tools/check_queries.py", "--all", sf_dir],
    )
    # plan anti-pattern sweep (round-15): a cartesian join or a
    # row-at-a-time Python UDF is invisible to both checks above at
    # sf0.001 — correct results, tolerable wall time — and fatal at
    # 100 TB. --no-artifact: the gate validates, it does not rewrite
    # the committed PLAN_AUDIT.json.
    ok &= _run(
        "plan-audit",
        [sys.executable, "tools/plan_audit.py", sf_dir, "--no-artifact"],
    )
    if ok:
        print("[gate] ALL GREEN — snapshot allowed")
        return 0
    print("[gate] RED — do NOT snapshot; fix or revert first")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
