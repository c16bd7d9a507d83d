#!/usr/bin/env python3
"""Contention-proof per-query baseline refresh.

Usage: python3 tools/rebaseline.py [run_json] [out_json] [quiet_ref_json]
       (defaults: target/bench_queries.json -> BASELINE_queries.json,
        quiet ref QUIET_REF.json)

The naive close-time refresh (`cp bench_queries.json BASELINE_queries
.json`) bakes whatever contention the closing run suffered into every
future regress budget (budget = baseline * 2 * calib_ratio) — and the
CPU calibration probe cannot see I/O weather, which is exactly what
inflates the promote-heavy queries (parquet file creation is
latency-bound). The round-16 verdict flagged this ratchet.

This refresh takes the closing run verbatim, EXCEPT that any query
listed in QUIET_REF.json (adjudicated quiet medians, probe- and
control-gated, methodology recorded in the file) is clamped to
min(run_median, 1.15 * quiet_median). A contended close can therefore
never widen an adjudicated query's budget; a genuinely faster run
still tightens it. Clamps are recorded in the output under
`clamped_to_quiet_ref` for audit.
"""
import json
import sys

run_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_queries.json"
out_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_queries.json"
ref_path = sys.argv[3] if len(sys.argv) > 3 else "QUIET_REF.json"

run = json.load(open(run_path))
try:
    quiet = json.load(open(ref_path))["queries_median"]
except FileNotFoundError:
    quiet = {}

clamped = {}
q = run["queries_median"]
for name, ref in sorted(quiet.items()):
    cap = round(1.15 * ref, 3)
    if name in q and q[name] > cap:
        clamped[name] = {"run": q[name], "clamped_to": cap}
        q[name] = cap

run["clamped_to_quiet_ref"] = clamped
with open(out_path, "w") as f:
    json.dump(run, f, indent=1, sort_keys=True)

if clamped:
    print("rebaseline: clamped to quiet reference:")
    for name, c in clamped.items():
        print(f"  {name}: {c['run']} -> {c['clamped_to']}")
else:
    print("rebaseline: no clamps needed (close ran at/under quiet reference)")
