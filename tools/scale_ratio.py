#!/usr/bin/env python3
"""Compare two graft Bench artifacts (base sf vs a ScaleProbe replica)
and print a per-query ratio table in markdown, sorted by ratio desc.

Usage: python3 tools/scale_ratio.py BENCH_run_sf0.1.json BENCH_run_graft_probe.json [k]

`k` (default 10) is the replica factor; ratios are judged against it:
a ratio <= ~k is at-most-linear, > k flags superlinear behavior worth a
plan diff. Sub-second base timings are overhead-dominated, so tiny
absolute ratios there are noise, not signal — the table carries the
absolute seconds so readers can weigh them.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"], d["value"]


def main():
    base_path, probe_path = sys.argv[1], sys.argv[2]
    k = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    base, base_total = load(base_path)
    probe, probe_total = load(probe_path)
    names = sorted(set(base) & set(probe))
    missing = sorted(set(base) ^ set(probe))
    if missing:
        print(f"<!-- WARNING: only in one artifact: {missing} -->")
    rows = []
    for n in names:
        b, p = base[n], probe[n]
        if b <= 0 or p <= 0:
            rows.append((float("inf"), n, b, p))
        else:
            rows.append((p / b, n, b, p))
    rows.sort(reverse=True)
    print(f"| query | sf0.1 s | {int(k)}x s | ratio |")
    print("|---|---|---|---|")
    flagged = 0
    for r, n, b, p in rows:
        mark = " **> k**" if r > k else ""
        if r > k:
            flagged += 1
        print(f"| {n} | {b:.2f} | {p:.2f} | {r:.2f}x{mark} |")
    import statistics
    ratios = [r for r, *_ in rows if r != float("inf")]
    print()
    print(f"totals: base {base_total:.1f}s -> probe {probe_total:.1f}s = "
          f"{probe_total / base_total:.2f}x wall for {int(k)}x data; "
          f"per-query median {statistics.median(ratios):.2f}x, "
          f"max {max(ratios):.2f}x, {flagged} queries above {int(k)}x")


if __name__ == "__main__":
    main()
