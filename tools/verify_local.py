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
import os
import sys
import threading
import time
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


# r5 POSTMORTEM — the driver hashes FIXED-DECIMAL-ROUNDED reprs.
# Evidence across rounds: transcendental ulp drift vs DuckDB (q15-q19,
# q24, q197, q227: absolute diffs <= ~5e-13 on values up to ~4e3)
# PASSES the driver; q188's interpolation drift (88135969469.000031 vs
# .000015 — a diff at the 5th DECIMAL PLACE of a ~9e10 value, still
# only 2e-16 relative) FAILS it; q21's whole-unit round() flip FAILS.
# Only a fixed-decimal rounding explains all three; q17 straddles a
# 9-decimal boundary on sf0.01 data yet passes the driver, so N <= 8,
# and q188's decimal-5 diff fails, so N >= 5. Floats therefore compare
# by their %.6f rendering — the conventional choice in that band, and
# it reproduces every observed driver verdict. Relative tolerances can
# NOT express this (1e-9 rel passed q188's absolute 1.6e-5 drift).
# REL_TOL is kept only to CLASSIFY a failure as ulp-class drift vs a
# genuine value error.
DECIMALS = 6
REL_TOL = 1e-9


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]

    def key(row):
        return tuple(
            f"{v:.6g}" if isinstance(v, float) and not math.isnan(v)
            else ("nan" if isinstance(v, float) else str(v))
            for v in row)

    out.sort(key=key)
    return out


def denan(rows):
    """NULL normalization: pandas (the single-execution oracle fetch)
    renders SQL NULL doubles as NaN while parquet pylist gives None —
    fold both (and genuine NaN, which the old compare already treated
    as self-equal) to None so sort keys and value compares align."""
    return [
        tuple(None if isinstance(v, float) and math.isnan(v) else v
              for v in r)
        for r in rows]


def vals_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # driver-hash semantics: equal iff the fixed-decimal renderings
        # agree (an absolute criterion — q188's 1.6e-5 drift at 9e10
        # magnitude must FAIL even though it is only 2e-16 relative)
        return f"{a:.{DECIMALS}f}" == f"{b:.{DECIMALS}f}"
    return str(a) == str(b)


def vals_close(a, b):
    """Old tolerance compare — used only to classify a repr failure as
    ulp-class drift vs a genuine value error."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        return abs(a - b) <= REL_TOL * max(1.0, abs(a), abs(b))
    return str(a) == str(b)


def rows_equal(g, e):
    return len(g) == len(e) and all(
        len(a) == len(b) and all(vals_equal(x, y) for x, y in zip(a, b))
        for a, b in zip(g, e))


def main(out_dir, sf_dir, only=None):
    out_dir = Path(out_dir)
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            # Spark-written table (e.g. ScaleGen sf1 output): a
            # directory of part files, not a single parquet file
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # At sf >= 0.1 a few oracle FORMULATIONS are super-linear even when
    # the Spark side is fine (e.g. q322's transitive-closure CTE over a
    # dense neighbor graph). Interrupt any oracle past the budget and
    # record it as a timeout — a scale statement about the ORACLE, not
    # a correctness verdict on the query (the sf0.01 driver gate stays
    # authoritative for those rows).
    budget = float(os.environ.get("ORACLE_TIMEOUT_SEC", "0") or 0)

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        pdir = out_dir / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # start the interrupt timer only once we are committed to
        # executing the oracle — starting it before the output check
        # leaked a live timer on the no-output path, and its later
        # con.interrupt() fired DURING a subsequent query's oracle,
        # spuriously recording a passing query as TIMEOUT
        timer = None
        if budget > 0:
            timer = threading.Timer(budget, con.interrupt)
            timer.start()
        try:
            spark_tbl = pq.read_table(pdir)
            got_cols = spark_tbl.column_names
            got_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
            # Single execution: the pandas frame supplies column names,
            # rows, AND dtype kinds (heavy oracles like q27/q48 would
            # otherwise run twice).
            duck_df = con.execute(sql).df()
            exp_cols = list(duck_df.columns)
            exp_rows = [tuple(r) for r in duck_df.itertuples(index=False)]
            # Driver-fetch dtype parity: a pandas/arrow-based driver
            # converts DuckDB HUGEINT (e.g. bare sum(int)) to float64,
            # so '5' hashes as '5.0' even when fetchall() values are
            # identical ints. This killed q21/q37 in rounds 1 AND 2.
            # Compare pandas dtype KINDS of both sides and fail on any
            # int-vs-float (or other) divergence.
            spark_df = spark_tbl.to_pandas()
            kind_diff = [
                (c, spark_df[c].dtype.kind, duck_df[c].dtype.kind)
                for c in exp_cols
                if c in spark_df.columns
                and spark_df[c].dtype.kind != duck_df[c].dtype.kind]
        except Exception as e:
            if timer is not None:
                timer.cancel()
            if isinstance(e, duckdb.InterruptException) or \
                    "INTERRUPT" in str(e).upper():
                print(f"TIMEOUT {name}: oracle exceeded {budget:.0f}s "
                      f"budget (oracle-formulation scale limit)", flush=True)
            else:
                print(f"FAIL {name}: {e}", flush=True)
            n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: schema {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        if kind_diff:
            print(f"FAIL {name}: pandas dtype kind mismatch "
                  f"(col, spark, duck): {kind_diff} — CAST the oracle "
                  f"column (HUGEINT sums -> BIGINT)")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        g = canon(denan(got_rows), got_cols)
        e = canon(denan(exp_rows), exp_cols)
        if not rows_equal(g, e):
            bad = [(a, b) for a, b in zip(g, e)
                   if not (len(a) == len(b)
                           and all(vals_equal(x, y) for x, y in zip(a, b)))][:3]
            ulp_only = all(
                len(a) == len(b) and all(vals_close(x, y) for x, y in zip(a, b))
                for a, b in zip(g, e))
            kind = ("repr drift (ulp-class — would flip the driver hash)"
                    if ulp_only else "value mismatch")
            print(f"FAIL {name}: {kind}, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows, {time.time()-t0:.1f}s)",
              flush=True)
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
