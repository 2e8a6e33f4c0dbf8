"""Round-over-round bench comparison with pinned per-query budgets.

Usage: python tools/bench_compare.py BASE.json CURRENT.json [--budget 1.5]

BASE is the pinned canon (BENCH_CANON.json — the round-4 BENCH_DETAIL
ledger) or any prior round's detail file; CURRENT is the round under test
(BENCH_DETAIL.json). Driver BENCH_r{N}.json files also load (their
bench.py line is wrapped under "parsed") but carry only the top-5 headline
queries, so budget coverage needs the detail ledgers.

Checks, in order of severity:
  * BUDGET (exit 1): a query in CURRENT's min-of-reps HEADLINE tier runs
    slower than ``budget``x its BASE min plus the measured spread noise —
    the canon-anchored regression gate (VERDICT r4 task #2).
  * EMPTY (exit 2): zero queries compared — the failure mode round 3's
    parsed-null ledger produced silently; now loud.
  * Spread-level regressions/improvements are reported informationally
    (reps-1 tail numbers swing with ambient load; only the budget factor
    fails the gate).

One JSON summary line on stdout; human-readable deltas on stderr.
"""

from __future__ import annotations

import json
import sys


def load(path):
    d = json.load(open(path))
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed";
    # a truncated capture leaves parsed: null (e.g. round 3) — degrade
    # to an empty ledger instead of crashing
    parsed = d.get("parsed", d)
    if parsed is None:
        print(f"# {path}: parsed is null (truncated capture), no queries to compare", file=sys.stderr)
        return {}
    return parsed


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    budget = 1.5
    if "--budget" in argv:
        i = argv.index("--budget")
        budget = float(argv[i + 1])
        del argv[i : i + 2]
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2

    a = load(argv[0])
    b = load(argv[1])
    # BENCH_DETAIL.json (round 4+) splits the ledger into a min-of-reps
    # headline tier and a reps=1 tail — compare across both
    qa = {**a.get("queries", {}), **a.get("tail_queries", {})}
    qb = {**b.get("queries", {}), **b.get("tail_queries", {})}
    sa, sb = a.get("spread", {}), b.get("spread", {})

    regressions, improvements, noise, budget_violations = {}, {}, {}, {}
    for name in sorted(set(qa) & set(qb)):
        va, vb = qa[name], qb[name]
        tol = max(sa.get(name, 0.0), sb.get(name, 0.0), 0.05)
        delta = round(vb - va, 3)
        if delta > tol:
            regressions[name] = {"from": va, "to": vb, "delta": delta, "tol": tol}
        elif delta < -tol:
            improvements[name] = {"from": va, "to": vb, "delta": delta, "tol": tol}
        else:
            noise[name] = delta
        # the budget gate: only CURRENT's headline tier (min-of-reps — a
        # stable number) is held to the canon; tail reps-1 numbers are
        # ambient-load-noisy by design and stay informational
        if name in b.get("queries", {}) and vb > budget * va + tol:
            budget_violations[name] = {
                "from": va,
                "to": vb,
                "limit": round(budget * va + tol, 3),
                "factor": round(vb / va, 2) if va else None,
            }
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    for name, d in sorted(budget_violations.items(), key=lambda kv: -kv[1]["to"]):
        print(
            f"BUDGET      {name}: {d['from']}s -> {d['to']}s (limit {d['limit']}s, {d['factor']}x)",
            file=sys.stderr,
        )
    for name, d in sorted(regressions.items(), key=lambda kv: -kv[1]["delta"]):
        print(f"REGRESSION  {name}: {d['from']}s -> {d['to']}s (+{d['delta']}s, tol {d['tol']}s)", file=sys.stderr)
    for name, d in sorted(improvements.items(), key=lambda kv: kv[1]["delta"]):
        print(f"improved    {name}: {d['from']}s -> {d['to']}s ({d['delta']}s)", file=sys.stderr)
    n_compared = len(noise) + len(regressions) + len(improvements)
    print(
        json.dumps(
            {
                "total_from": a.get("value"),
                "total_to": b.get("value"),
                "n_compared": n_compared,
                "budget_factor": budget,
                "budget_violations": budget_violations,
                "regressions": regressions,
                "improvements": improvements,
                "within_noise": len(noise),
                "only_in_first": only_a,
                "only_in_second": only_b,
            }
        )
    )
    if n_compared == 0:
        print("# EMPTY comparison: zero shared queries — check the ledgers", file=sys.stderr)
        return 2
    return 1 if budget_violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
