#!/usr/bin/env python3
"""Round-over-round bench comparison (dev tooling only).

Compares two bench JSON records (the lossless per-query maps) over
their SHARED query set, prints formal regressions/improvements by the
house rule (>1.4x AND >0.5 s = formal), plus the new-row costs.

Per-row band (round-10): if docs/bench_band.json exists (written by
dev/bench_band.py from repeated same-code fresh-process reps), a row's
regression ratio threshold widens to max(1.4, its measured p90/min) —
a movement inside the band the SAME code exhibits across process
restarts is IO spread, not a regression. Rows without band data keep
the fixed 1.4x.

    python3 dev/bench_compare.py <old.json> <new.json> [band.json]
"""
import json
import os
import sys


def main():
    if len(sys.argv) not in (3, 4):
        sys.exit("usage: bench_compare.py <old.json> <new.json> [band.json]")
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    band_path = sys.argv[3] if len(sys.argv) == 4 else "docs/bench_band.json"
    band = (json.load(open(band_path)) if os.path.exists(band_path) else {})

    def ratio_bar(q):
        b = band.get(q, {}).get("p90_over_min")
        return max(1.4, b) if b else 1.4

    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    so, sn = sum(old[q] for q in shared), sum(new[q] for q in shared)
    if not shared or so <= 0:
        sys.exit(f"no comparable shared queries (shared={len(shared)}) — "
                 "are these records from the same suite?")
    print(f"shared {len(shared)}: {so:.1f} -> {sn:.1f} s ({sn/so:.2f}x)")
    if band:
        banded = sorted(set(band) & set(shared))
        print(f"per-row band active for {len(banded)} rows: "
              + ", ".join(f"{q}={ratio_bar(q):.2f}x" for q in banded))
    reg = [(q, old[q], new[q]) for q in shared
           if new[q] > ratio_bar(q) * old[q] and new[q] - old[q] > 0.5]
    imp = [(q, old[q], new[q]) for q in shared
           if old[q] > ratio_bar(q) * new[q] and old[q] - new[q] > 0.5]
    print(f"\nformal regressions ({len(reg)}):")
    for q, a, b in sorted(reg, key=lambda t: t[1] - t[2]):
        print(f"  {q}: {a:.2f} -> {b:.2f}")
    print(f"\nformal improvements ({len(imp)}):")
    for q, a, b in sorted(imp, key=lambda t: t[2] - t[1]):
        print(f"  {q}: {a:.2f} -> {b:.2f}")
    print(f"\nnew rows ({len(added)}, {sum(new[q] for q in added):.1f} s):")
    for q in added:
        print(f"  {q}: {new[q]:.2f}")
    slow = sorted(new.items(), key=lambda kv: -kv[1])[:5]
    print("\nslowest five at HEAD:")
    for q, v in slow:
        print(f"  {q}: {v:.2f}")


if __name__ == "__main__":
    main()
