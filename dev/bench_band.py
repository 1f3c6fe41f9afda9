#!/usr/bin/env python3
"""Aggregate repeated fresh-process bench records into a per-row
spread band (dev tooling only) — the round-9 verdict's task #5: the
same code measured across process restarts moves inside a write-heavy
IO band, and the formal-regression threshold should come from the
MEASURED band, not a fixed guess.

    python3 dev/bench_band.py <rep1.json> <rep2.json> ... [-o docs/bench_band.json]

Each input is a Bench record ({"queries": {name: seconds}}); every rep
must carry the same query set. Output: per-query min / median / p90 /
max / p90_over_min across reps. dev/bench_compare.py reads the output
(if present) to widen its per-row regression threshold.
"""
import json
import statistics
import sys


def main():
    args = sys.argv[1:]
    out = "docs/bench_band.json"
    if "-o" in args:
        i = args.index("-o")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 3:
        sys.exit("need >= 3 rep records for a meaningful band")
    reps = [json.load(open(p))["queries"] for p in args]
    names = set(reps[0])
    for r in reps:
        if set(r) != names:
            sys.exit("rep query sets differ — aggregate like with like")
    band = {}
    for q in sorted(names):
        xs = sorted(r[q] for r in reps)
        if any(x < 0 for x in xs):
            sys.exit(f"{q}: a rep failed (-1 sentinel) — fix before banding")
        p90 = xs[min(len(xs) - 1, int(round(0.9 * (len(xs) - 1))))]
        band[q] = {
            "n": len(xs),
            "min": round(xs[0], 3),
            "median": round(statistics.median(xs), 3),
            "p90": round(p90, 3),
            "max": round(xs[-1], 3),
            "p90_over_min": round(p90 / xs[0], 3) if xs[0] > 0 else None,
        }
    json.dump(band, open(out, "w"), indent=1)
    print(f"wrote {out} ({len(band)} rows, {len(reps)} reps)")
    for q, b in band.items():
        print(f"  {q}: min {b['min']} median {b['median']} p90 {b['p90']} "
              f"(p90/min {b['p90_over_min']})")


if __name__ == "__main__":
    main()
