#!/usr/bin/env python3
"""Budgeted oracle compare: run tools/check.py per oracle with a per-query
timeout so DuckDB-quadratic oracles register as ORACLE-SLOW instead of
hanging the pass — the sf1 spot-gate protocol (docs/SF1_GATE.md). The
budget classifies DuckDB-side cost; it never relaxes the compare itself.

Usage: python3 tools/check_budget.py [sfdir] [outdir] [budget_sec]
"""
import json, subprocess, sys
from concurrent.futures import ThreadPoolExecutor

import sys as _sys
SF = _sys.argv[1] if len(_sys.argv) > 1 else "/root/repo/target/sf1"
OUT = _sys.argv[2] if len(_sys.argv) > 2 else "/tmp/verify_sf1"
BUDGET = int(_sys.argv[3]) if len(_sys.argv) > 3 else 90
names = sorted(json.load(open(f"{OUT}/oracle_sql.json")).keys())

import os
# cap each lane's DuckDB at its fair share of the machine: without this,
# alphabetically adjacent heavy oracles co-schedule and time each other
# out (4 uncapped processes each grabbing every core)
ENV = dict(os.environ, GRAFT_DUCKDB_THREADS=str(max(1, (os.cpu_count() or 8) // 4)))

def run(name):
    try:
        r = subprocess.run(
            ["python3", "/root/repo/tools/check.py", SF, OUT, name],
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
            r = subprocess.run(
                ["python3", "/root/repo/tools/check.py", SF, OUT, name],
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
