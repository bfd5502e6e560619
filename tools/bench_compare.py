#!/usr/bin/env python3
"""Diff two BENCH_FULL.json files (round-over-round regression triage).

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio]

Prints queries whose median changed by more than `ratio` (default 1.3x)
in either direction, plus totals over the comparable intersection —
the numbers VERDICT rounds have been reconstructing by hand from
truncated stdout tails.
"""
import json
import sys


def main(old_path, new_path, ratio=1.3):
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    both = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    o_sum = sum(old[k]["median"] for k in both)
    n_sum = sum(new[k]["median"] for k in both)
    print(f"comparable: {len(both)} queries  "
          f"{o_sum:.1f}s -> {n_sum:.1f}s ({n_sum / o_sum:.2f}x)")
    if only_old:
        print(f"removed ({len(only_old)}): {' '.join(only_old)}")
    if only_new:
        added = sum(new[k]["median"] for k in only_new)
        print(f"added ({len(only_new)}, {added:.1f}s): {' '.join(only_new)}")
    moved = []
    for k in both:
        o, n = old[k]["median"], new[k]["median"]
        if o > 0.05 and (n / o > ratio or o / n > ratio):
            moved.append((n / o, k, o, n))
    for r, k, o, n in sorted(moved, reverse=True):
        tag = "REGRESSION" if r > 1 else "improved"
        print(f"  {tag:10s} {k:32s} {o:6.2f} -> {n:6.2f} ({r:.2f}x)")
    if not moved:
        print("  no per-query change beyond the ratio threshold")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.3)
