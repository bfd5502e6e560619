#!/usr/bin/env python3
"""Assemble the round-8 scale-gate artifacts from verify_local logs.

Inputs: one or more "<log>:<label>" pairs; later logs OVERRIDE earlier
verdicts per query (re-runs after fixes). Output: one JSON artifact
with per-query status, rows, seconds, and the run label that produced
the final verdict.

Usage:
  python3 tools/assemble_scale_gate.py OUT.json sf_dir log1:label1 [log2:label2 ...]
"""
import json
import re
import sys

LINE = re.compile(
    r"^(PASS|FAIL|TIMEOUT) (\S+?):? (?:\((\d+) rows(?:, ([\d.]+)s)?\))?(.*)$")


def main(out, sf_dir, pairs):
    results = {}
    for pair in pairs:
        log, label = pair.rsplit(":", 1)
        for raw in open(log):
            m = LINE.match(raw.strip())
            if not m:
                continue
            status, name, rows, secs, detail = m.groups()
            results[name] = {
                "status": status,
                "rows": int(rows) if rows else None,
                "oracle_sec": float(secs) if secs else None,
                "run": label,
            }
            if status != "PASS":
                results[name]["detail"] = detail.strip()[:400]
    n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
    artifact = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_pass": n_pass,
        "n_fail": sum(1 for r in results.values() if r["status"] == "FAIL"),
        "n_oracle_timeout": sum(
            1 for r in results.values() if r["status"] == "TIMEOUT"),
        "queries": dict(sorted(results.items())),
    }
    json.dump(artifact, open(out, "w"), indent=1)
    print(f"{out}: {n_pass}/{len(results)} pass")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
