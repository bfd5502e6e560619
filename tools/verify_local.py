#!/usr/bin/env python3
"""Local pre-check that mimics the driver's correctness gate.

Usage: python3 tools/verify_local.py <outDir> <sfDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran, so
<outDir> holds one parquet dir per query plus oracle_sql.json. Runs each
oracle SQL in DuckDB over the sfDir tables and compares: schema (sorted
column names), row count, and values (rows sorted, doubles compared with
tolerance + rounded-repr hash like the driver).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(out_dir, sf_dir):
    out_dir = Path(out_dir)
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = out_dir / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(pdir)
            got_cols = spark_tbl.column_names
            got_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
            res = con.execute(sql)
            exp_cols = [d[0] for d in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: schema {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        g = canon(got_rows, got_cols)
        e = canon(exp_rows, exp_cols)
        if g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
