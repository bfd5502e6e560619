#!/usr/bin/env python3
"""Fit growth exponents from LadderProbe / bench points.

Inputs: a JSON spec {"points": [{"sf": 0.1, "source": file-or-label,
"queries": {...}}, ...]} given inline as CLI pairs sf=path. Each path
is either a BENCH_*.json artifact (queries -> {median: s} or plain
seconds) or a LadderProbe one-line JSON (queries -> seconds).

For every query present in >= 2 points, prints and writes the fitted
exponent between consecutive points: e = log(t2/t1) / log(sf2/sf1),
the quantity the scale ladder argues about (1 = linear, 2 =
quadratic).

Usage: tools/ladder_fit.py OUT.json sf=path [sf=path ...]
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", d)
    out = {}
    for k, v in qs.items():
        if isinstance(v, dict):
            v = v.get("median", v.get("sec"))
        if isinstance(v, (int, float)):
            out[k] = float(v)
    return out


def main(out_path, pairs):
    points = []
    for p in pairs:
        sf, path = p.split("=", 1)
        points.append((float(sf), path, load(path)))
    points.sort()
    queries = set()
    for _, _, qs in points:
        queries |= set(qs)
    rows = {}
    for q in sorted(queries):
        segs = []
        for (sf1, _, a), (sf2, _, b) in zip(points, points[1:]):
            if q in a and q in b and a[q] > 0:
                e = math.log(b[q] / a[q]) / math.log(sf2 / sf1)
                segs.append({"from_sf": sf1, "to_sf": sf2,
                             "t_from": a[q], "t_to": b[q],
                             "exponent": round(e, 3)})
        if segs:
            rows[q] = segs
    artifact = {
        "points": [{"sf": sf, "source": path} for sf, path, _ in points],
        "exponents": rows,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    for q, segs in sorted(rows.items()):
        desc = "  ".join(
            f"{s['from_sf']}→{s['to_sf']}: {s['t_from']:.2f}s→"
            f"{s['t_to']:.2f}s e={s['exponent']}" for s in segs)
        print(f"{q}: {desc}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
