#!/usr/bin/env python3
"""Budgeted oracle compare: run tools/check.py per oracle with a per-query
timeout so DuckDB-quadratic oracles register as ORACLE-SLOW instead of
hanging the pass — the sf1 spot-gate protocol (docs/SF1_GATE.md). The
budget classifies DuckDB-side cost; it never relaxes the compare itself.

ESTIMATE-REGIME LANE: a face whose sketch leaves its exact regime at this
decade's cardinality (theta k=4096 retained entries) structurally cannot
hash-match exact SQL — its answer IS an estimate. Those faces compare in a
dedicated lane instead of being a standing expected-failure: rows, schema
and key columns must match EXACTLY, and every estimated cell must sit
inside the same error bound tools/SketchError gates
(|est−exact| ≤ max(5, 10%·exact); ratio columns derived from two bounded
estimates get the propagated max(0.02, 20%·exact)). The exact-mode hash
compare still runs untouched at sf0.001/sf0.01 (tools/check.py and the
driver's gate) — this lane exists only where estimate mode is REACHED.

Usage: python3 tools/check_budget.py [sfdir] [outdir] [budget_sec]
"""
import json, math, subprocess, sys
from concurrent.futures import ThreadPoolExecutor

import os

# face -> (sort keys, estimated count columns, estimate-derived ratio cols)
ESTIMATE_LANE = {
    "events_theta_overlap": {
        "keys": ["type_a", "type_b"],
        "est": ["users_a", "users_b", "users_both", "users_only_a"],
        "ratio": ["audience_jaccard"],
    },
}

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_estimate_lane(sf, out, name):
    """Exit 0 iff the face passes its estimate-regime contract."""
    import duckdb
    import pandas as pd
    cfg = ESTIMATE_LANE[name]
    con = duckdb.connect()
    threads = os.environ.get("GRAFT_DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    sql = json.load(open(f"{out}/oracle_sql.json"))[name]
    expect = con.execute(sql).fetchdf().sort_values(cfg["keys"], ignore_index=True)
    got = pd.read_parquet(f"{out}/{name}").sort_values(cfg["keys"], ignore_index=True)
    if sorted(got.columns) != sorted(expect.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(expect.columns)}")
        return 1
    if len(got) != len(expect):
        print(f"FAIL {name}: rows {len(got)} vs {len(expect)}")
        return 1
    bad, max_rel = 0, 0.0
    for c in cfg["keys"]:
        for i, (x, y) in enumerate(zip(got[c].tolist(), expect[c].tolist())):
            if x != y:
                print(f"FAIL {name}: key col {c} row {i}: {x!r} != {y!r}")
                bad += 1
    for c in cfg["est"]:
        for i, (x, y) in enumerate(zip(got[c].tolist(), expect[c].tolist())):
            lim = max(5.0, 0.10 * abs(y))
            if abs(x - y) > lim:
                print(f"FAIL {name}: est col {c} row {i}: {x!r} vs exact {y!r} (bound {lim})")
                bad += 1
            if y:
                max_rel = max(max_rel, abs(x - y) / abs(y))
    for c in cfg["ratio"]:
        for i, (x, y) in enumerate(zip(got[c].tolist(), expect[c].tolist())):
            if math.isnan(x) and math.isnan(y):
                continue
            lim = max(0.02, 0.20 * abs(y))
            if abs(x - y) > lim:
                print(f"FAIL {name}: ratio col {c} row {i}: {x!r} vs exact {y!r} (bound {lim})")
                bad += 1
    if bad:
        print(f"     {name}: {bad} cells outside the estimate bound")
        return 1
    print(f"PASS {name} ({len(got)} rows) [estimate lane, max rel err "
          f"{100 * max_rel:.2f}% <= max(5, 10%)]")
    return 0


if len(sys.argv) > 1 and sys.argv[1] == "--lane":
    sys.exit(run_estimate_lane(sys.argv[2], sys.argv[3], sys.argv[4]))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
BUDGET = int(sys.argv[3]) if len(sys.argv) > 3 else 90
names = sorted(json.load(open(f"{OUT}/oracle_sql.json")).keys())

# cap each lane's DuckDB at its fair share of the machine: without this,
# alphabetically adjacent heavy oracles co-schedule and time each other
# out (4 uncapped processes each grabbing every core)
ENV = dict(os.environ, GRAFT_DUCKDB_THREADS=str(max(1, (os.cpu_count() or 8) // 4)))


def cmd_for(name):
    if name in ESTIMATE_LANE:
        return ["python3", os.path.abspath(__file__), "--lane", SF, OUT, name]
    return ["python3", "/root/repo/tools/check.py", SF, OUT, name]


def run(name):
    try:
        r = subprocess.run(cmd_for(name),
                           capture_output=True, text=True, timeout=BUDGET, env=ENV)
        line = [l for l in r.stdout.splitlines() if l.startswith(("PASS", "FAIL"))]
        return name, (line[0] if line else f"FAIL {name}: no output")
    except subprocess.TimeoutExpired:
        return name, f"ORACLE-SLOW {name} (DuckDB exceeded {BUDGET}s at sf1)"

with ThreadPoolExecutor(max_workers=4) as ex:
    results = dict(ex.map(run, names))
# A lane timeout can be co-scheduling inflation (three heavy oracles are
# alphabetically adjacent), not oracle cost. The budget classifies ORACLE
# cost, so retry each timeout once SEQUENTIALLY — same 90s budget, full
# machine, nothing else running — before classifying it oracle-slow.
for name, v in list(results.items()):
    if v.startswith("ORACLE-SLOW"):
        ENV = dict(os.environ)
        ENV.pop("GRAFT_DUCKDB_THREADS", None)
        try:
            r = subprocess.run(cmd_for(name),
                               capture_output=True, text=True, timeout=BUDGET, env=ENV)
            line = [l for l in r.stdout.splitlines()
                    if l.startswith(("PASS", "FAIL"))]
            if line:
                results[name] = line[0] + " [serial retry]"
        except subprocess.TimeoutExpired:
            pass
npass = sum(1 for v in results.values() if v.startswith("PASS"))
nslow = sum(1 for v in results.values() if v.startswith("ORACLE-SLOW"))
nfail = len(results) - npass - nslow
for n in names:
    print(results[n])
print(f"== {npass} pass, {nfail} fail, {nslow} oracle-slow ==")
sys.exit(1 if nfail else 0)
