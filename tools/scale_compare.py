#!/usr/bin/env python3
"""Scaling-evidence table: join two BENCH_FULL-format subset files
(sf0.1 and sf1 runs of the same queries) into per-query ratios.

Usage: python3 tools/scale_compare.py BENCH_SUBSET_SF01.json \
           BENCH_SUBSET_SF1.json [--md]

A 10x data scale-up on local[32] should land ratios well under 10x for
scan-bound queries (fixed overheads amortize) and near the data growth
for shuffle/join-bound ones; a super-linear ratio (> ~12x) flags a
plan whose shape does not survive scale.
"""
import json
import sys


def main(f01, f1, md=False):
    a = json.load(open(f01))["queries"]
    b = json.load(open(f1))["queries"]
    rows = []
    for q in sorted(set(a) & set(b)):
        m0, m1 = a[q]["median"], b[q]["median"]
        n0, n1 = a[q]["min"], b[q]["min"]
        rows.append((q, m0, m1, m1 / m0, n0, n1, n1 / n0))
    rows.sort(key=lambda r: -r[3])
    if md:
        print("| query | sf0.1 med | sf1 med | ratio | sf0.1 min | sf1 min | min ratio |")
        print("|---|---|---|---|---|---|---|")
        for q, m0, m1, rm, n0, n1, rn in rows:
            print(f"| {q} | {m0:.2f} | {m1:.2f} | {rm:.1f}x | "
                  f"{n0:.2f} | {n1:.2f} | {rn:.1f}x |")
    else:
        for q, m0, m1, rm, n0, n1, rn in rows:
            print(f"{q:28s} med {m0:7.2f} -> {m1:8.2f} ({rm:5.1f}x)  "
                  f"min {n0:7.2f} -> {n1:8.2f} ({rn:5.1f}x)")
    t0 = sum(r[1] for r in rows)
    t1 = sum(r[2] for r in rows)
    print(f"\ntotal median: {t0:.1f} s -> {t1:.1f} s "
          f"({t1 / t0:.2f}x on 10x data)")


if __name__ == "__main__":
    md = "--md" in sys.argv
    args = [x for x in sys.argv[1:] if x != "--md"]
    main(args[0], args[1], md)
