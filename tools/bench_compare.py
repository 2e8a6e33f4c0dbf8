"""Round-over-round bench comparison, spread-aware.

Usage: python tools/bench_compare.py BENCH_rA.json BENCH_rB.json

A per-query delta only counts as a regression/improvement if it exceeds
the measured noise (the max of both rounds' min-to-max spreads, when
present) — otherwise it is reported as noise. Queries present in only one
round are listed separately. One JSON summary line on stdout.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
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

    a = load(sys.argv[1])
    b = load(sys.argv[2])
    # BENCH_DETAIL.json (round 4+) splits the ledger into a min-of-reps
    # headline tier and a reps=1 tail — compare across both
    qa = {**a.get("queries", {}), **a.get("tail_queries", {})}
    qb = {**b.get("queries", {}), **b.get("tail_queries", {})}
    sa, sb = a.get("spread", {}), b.get("spread", {})

    regressions, improvements, noise = {}, {}, {}
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
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    for name, d in sorted(regressions.items(), key=lambda kv: -kv[1]["delta"]):
        print(f"REGRESSION  {name}: {d['from']}s -> {d['to']}s (+{d['delta']}s, tol {d['tol']}s)", file=sys.stderr)
    for name, d in sorted(improvements.items(), key=lambda kv: kv[1]["delta"]):
        print(f"improved    {name}: {d['from']}s -> {d['to']}s ({d['delta']}s)", file=sys.stderr)
    print(
        json.dumps(
            {
                "total_from": a.get("value"),
                "total_to": b.get("value"),
                "n_compared": len(noise) + len(regressions) + len(improvements),
                "regressions": regressions,
                "improvements": improvements,
                "within_noise": len(noise),
                "only_in_first": only_a,
                "only_in_second": only_b,
            }
        )
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
