#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Runs DuckDB on each oracle_sql.json entry against the same parquet tables and
compares with the Verify.scala parquet dumps: row count, column names, and
exact (bitwise for floats) cell values after sorting rows/columns.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bitwise-equal doubles expected
    return a == b


def main() -> None:
    con = duckdb.connect()
    # optional per-process thread cap: the budgeted sf1 wrapper runs 4
    # compare lanes in parallel, and without a cap each DuckDB grabs every
    # core — adjacent heavy oracles then time each other out. No effect on
    # results, only on scheduling; the driver's sequential gate never sets it.
    threads = os.environ.get("GRAFT_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    # optional 3rd+ args: restrict the compare to these query names
    only = set(sys.argv[3:])
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        try:
            got = norm(pd.read_parquet(f"{OUT}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(expect.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(expect.columns)}")
            n_fail += 1
            continue
        if len(got) != len(expect):
            print(f"FAIL {name}: rows {len(got)} vs {len(expect)}")
            n_fail += 1
            continue
        bad = 0
        for c in got.columns:
            gk, ek = got[c].dtype.kind, expect[c].dtype.kind
            if {gk, ek} == {"i", "f"}:
                # the driver hashes typed values: int64 vs float64 is a FAIL
                # even when numerically equal (e.g. DuckDB SUM(BIGINT)→HUGEINT
                # →float64 in fetchdf; CAST the oracle column to BIGINT)
                print(f"FAIL {name}: col {c} dtype {got[c].dtype} vs {expect[c].dtype}")
                bad += 1
        for c in got.columns:
            ga, ea = got[c].tolist(), expect[c].tolist()
            for i, (x, y) in enumerate(zip(ga, ea)):
                if not cmp_cell(x, y):
                    if bad == 0:
                        print(f"FAIL {name}: col {c} row {i}: {x!r} != {y!r}")
                    bad += 1
        if bad:
            print(f"     {name}: {bad} mismatched cells")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
