#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query minima table from every committed
bench artifact (VERDICT r10 task #2).

Folds the `queries` map of each committed BENCH*.json that was measured
at sf0.1 (the baseline scale — probe replicas are excluded by their
`sf` path) into one min-per-query table and rewrites the table section
of BASELINE.md in place. Failed timings (-1.0) never count as minima.

The companion guard is BaselineTableSpec (src/test): the table's key
set must equal SparkEntry.queries.keySet, so a query added without a
seeded minimum — or a minimum left behind by a renamed query — fails
the suite, which is the infrastructure the weak-mark drift detection
runs on.

Usage: python3 tools/baseline_table.py [--dry-run]
"""
import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "BASELINE.md")
HEADER = "| query | sec (sf0.1, min across runs) | context |"


def sf01_artifacts():
    """Committed bench artifacts measured at sf0.1 with a queries map."""
    out = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH*.json"))):
        try:
            with open(path) as fh:
                d = json.load(fh)
        except (json.JSONDecodeError, OSError):
            continue
        qs = d.get("queries")
        sf = str(d.get("sf", ""))
        if isinstance(qs, dict) and qs and sf.endswith("sf0.1"):
            out.append((os.path.basename(path), qs))
    return out


def context_of(name):
    """Measurement context of an artifact, derived from its name
    (r11 verdict item 6: the table used to fold idle seeds and
    in-sweep numbers indiscriminately — now each minimum says which
    kind of run produced it)."""
    if name.startswith("BENCH_seed"):
        return "idle seed (single-query min-of-2)"
    if name.startswith("BENCH_local"):
        return "idle full sweep"
    if re.match(r"BENCH_r\d+_c8", name):
        return "driver full sweep (8 cores)"
    if re.match(r"BENCH_r\d+_before", name):
        return "pre-round local full sweep"
    if re.match(r"BENCH_r\d+\.json", name):
        return "driver full sweep (32 cores)"
    if name.startswith("BENCH_run"):
        return "local full sweep"
    return "full sweep"


def fold_minima(artifacts):
    minima, sources = {}, {}
    for name, qs in artifacts:
        for q, sec in qs.items():
            if not isinstance(sec, (int, float)) or sec <= 0:
                continue  # -1.0 = failed run, never a minimum
            if q not in minima or sec < minima[q]:
                minima[q] = sec
                sources[q] = name
    return minima, sources


def rewrite_table(text, minima, sources):
    lines = text.splitlines(keepends=True)
    try:
        start = next(i for i, l in enumerate(lines)
                     if l.rstrip() == HEADER)
    except StopIteration:
        sys.exit(f"[baseline_table] header row not found: {HEADER!r}")
    end = start + 2  # header + |---|---| separator
    while end < len(lines) and lines[end].startswith("|"):
        end += 1
    rows = [f"| {q} | {minima[q]:.3f} | {sources[q]} — "
            f"{context_of(sources[q])} |\n"
            for q in sorted(minima, key=lambda q: (-minima[q], q))]
    return "".join(lines[:start + 2] + rows + lines[end:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    arts = sf01_artifacts()
    minima, sources = fold_minima(arts)
    print(f"[baseline_table] {len(arts)} sf0.1 artifacts -> "
          f"{len(minima)} query minima")
    with open(BASELINE) as fh:
        text = fh.read()
    new = rewrite_table(text, minima, sources)
    if args.dry_run:
        print("".join(l for l in new.splitlines(keepends=True)
                      if l.startswith("|"))[:2000])
    else:
        with open(BASELINE, "w") as fh:
            fh.write(new)
        print(f"[baseline_table] rewrote table in {BASELINE}")


if __name__ == "__main__":
    main()
