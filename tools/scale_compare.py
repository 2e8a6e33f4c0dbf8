"""Scale-up study: compare per-query bench times across two scale factors
and flag super-linear queries.

    python tools/scale_compare.py BENCH_DETAIL.json /tmp/r9/BENCH_SF1.json \
        --ratio 10 --budget 2.0

For each query present in both ledgers (headline + tail tiers merged), the
scale factor is ``t_big / max(t_small, floor)`` — ``floor`` (default 0.3 s)
keeps fixed session/plan overhead from inflating the ratio of sub-second
queries.  A query is flagged when its factor exceeds ``ratio * budget``
(data grew ``ratio``×; anything beyond ``budget``× the ideal linear factor
is super-linear enough to investigate before a 100 TB run).

Exit code 1 when any flagged query lacks an entry in the ``--allow`` list —
the same adjudication discipline as plan_audit allowances.
"""

from __future__ import annotations

import argparse
import json
import sys


def _times(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    out: dict[str, float] = {}
    for tier in ("queries", "tail_queries"):
        for k, v in (d.get(tier) or {}).items():
            if isinstance(v, (int, float)):
                out[k] = float(v)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("small", help="per-query ledger at the small sf (BENCH_DETAIL.json)")
    ap.add_argument("big", help="per-query ledger at the big sf")
    ap.add_argument("--ratio", type=float, default=10.0, help="data size ratio big/small")
    ap.add_argument("--budget", type=float, default=2.0, help="allowed multiple of the ideal linear factor")
    ap.add_argument("--floor", type=float, default=0.3, help="small-side time floor (s) to absorb fixed overhead")
    ap.add_argument("--allow", default="", help="comma-separated adjudicated query names")
    args = ap.parse_args()

    small, big = _times(args.small), _times(args.big)
    allow = {q for q in args.allow.split(",") if q}
    shared = sorted(set(small) & set(big))
    if not shared:
        print("no shared queries between the two ledgers — nothing to compare")
        return 1
    rows = []
    for q in shared:
        factor = big[q] / max(small[q], args.floor)
        rows.append((factor, q, small[q], big[q]))
    rows.sort(reverse=True)

    limit = args.ratio * args.budget
    flagged = [r for r in rows if r[0] > limit and r[1] not in allow]
    print(f"{len(shared)} shared queries; ideal linear factor {args.ratio}x, flag limit {limit}x")
    print(f"{'factor':>8}  {'small_s':>8}  {'big_s':>8}  query")
    for factor, q, s, b in rows[:25]:
        mark = " <-- SUPER-LINEAR" if factor > limit and q not in allow else (" (allowed)" if factor > limit else "")
        print(f"{factor:8.1f}  {s:8.2f}  {b:8.2f}  {q}{mark}")
    sub = sum(1 for f, *_ in rows if f <= args.ratio)
    print(f"\n{sub}/{len(rows)} queries scale at-or-below linear; median factor "
          f"{sorted(f for f, *_ in rows)[len(rows)//2]:.1f}x")
    if flagged:
        print(f"FLAGGED ({len(flagged)}): {[q for _, q, _, _ in flagged]}")
        return 1
    print("all within the scale budget")
    return 0


if __name__ == "__main__":
    sys.exit(main())
