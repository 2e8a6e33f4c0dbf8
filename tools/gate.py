"""One-command local gate: plan audit + full oracle compare + pytest.

Runs the three checks every round must pass BEFORE committing and prints a
single summary JSON line, exiting 0 only when all are green:

    python tools/gate.py                 # full gate (oracle at sf0.01, vanilla session)
    python tools/gate.py --fast          # oracle at sf0.001 (quicker iteration)
    python tools/gate.py --skip pytest   # skip stages (plan_audit,oracles,stream_audit,pytest)
    python tools/gate.py --bench         # also run bench.py at sf0.1 and hold
                                         # the headline to BENCH_CANON.json budgets

Stages:
  * plan_audit — ``tools/plan_audit.py``: every batch plan free of
    BatchEvalPython / CartesianProduct / over-budget single partitions.
  * oracles    — ``ORACLE_VANILLA=1 tools/check_oracles.py <sf_dir>``:
    all declared queries vs DuckDB on a default-config session (the
    driver's harness shape).
  * stream_audit — ``tools/stream_audit.py``: every live micro-batch plan
    free of BatchEvalPython, state bounded by input, eviction families
    actually evict (round 10 — the streaming half plan_audit skips).
  * pytest     — ``python -m pytest tests/ -x -q`` (fast tier: pytest.ini
    deselects ``slow``) PLUS ``-m slow`` (the whole-registry sweeps), so
    the gate covers both tiers while the driver's default run stays
    inside its verification window.
  * bench      — (opt-in) ``python bench.py`` then ``tools/bench_compare.py
    BENCH_CANON.json BENCH_DETAIL.json``: fails on a >1.5x-beyond-spread
    headline regression vs the pinned round-4 canon, or an empty compare.

Each stage runs as a subprocess so one failure can't mask another's
output; per-stage tails are echoed to stderr and summarized on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name: str, cmd: list[str], env: dict | None = None) -> dict:
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd,
        cwd=REPO,
        env={**os.environ, **(env or {})},
        capture_output=True,
        text=True,
    )
    dt = time.perf_counter() - t0
    tail = (proc.stdout + proc.stderr)[-2000:]
    print(f"--- {name} (rc={proc.returncode}, {dt:.1f}s) ---\n{tail}", file=sys.stderr)
    return {"rc": proc.returncode, "sec": round(dt, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="oracle gate at sf0.001 instead of sf0.01")
    ap.add_argument("--skip", default="", help="comma-separated stages to skip (plan_audit,oracles,pytest)")
    ap.add_argument("--bench", action="store_true", help="also run bench.py + budget compare vs BENCH_CANON.json")
    args = ap.parse_args()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}
    sf_dir = "/root/testdata/sf0.001" if args.fast else "/root/testdata/sf0.01"

    results: dict[str, dict] = {}
    if "plan_audit" not in skip:
        results["plan_audit"] = _run("plan_audit", [sys.executable, "tools/plan_audit.py"])
    if "oracles" not in skip:
        results["oracles"] = _run(
            "oracles",
            [sys.executable, "tools/check_oracles.py", sf_dir],
            env={"ORACLE_VANILLA": "1"},
        )
    if "stream_audit" not in skip:
        results["stream_audit"] = _run(
            "stream_audit", [sys.executable, "tools/stream_audit.py", "/root/testdata/sf0.001"]
        )
    if "pytest" not in skip:
        # r11: two tiers. The default run is the DRIVER's command (fast tier,
        # pytest.ini deselects `slow`); the slow tier carries the
        # whole-registry sweeps so the gate keeps full coverage locally.
        results["pytest"] = _run("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
        results["pytest_slow"] = _run(
            "pytest_slow", [sys.executable, "-m", "pytest", "tests/", "-x", "-q", "-m", "slow"]
        )
    if args.bench:
        results["bench"] = _run("bench", [sys.executable, "bench.py"])
        if results["bench"]["rc"] == 0:
            results["bench_budget"] = _run(
                "bench_budget",
                [sys.executable, "tools/bench_compare.py", "BENCH_CANON.json", "BENCH_DETAIL.json"],
            )

    ok = all(r["rc"] == 0 for r in results.values())
    print(
        json.dumps(
            {
                "gate": "pass" if ok else "FAIL",
                "sf_dir": sf_dir,
                "stages": {k: ("pass" if v["rc"] == 0 else f"FAIL(rc={v['rc']})") for k, v in results.items()},
                "sec": {k: v["sec"] for k, v in results.items()},
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
