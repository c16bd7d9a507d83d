#!/usr/bin/env python3
"""Per-query bench regression check, contention-adjusted.

Usage: python3 tools/regress.py [bench_queries.json] [baseline_queries.json]
       (defaults: target/bench_queries.json vs BASELINE_queries.json)

Compares the run's `queries_median` map against the committed baseline,
scaling the allowance by the ratio of `calib_sec` values (the fixed
synthetic workload Bench times first): a run on a 2x-contended box gets
a 2x-wider budget before anything is flagged, so real code regressions
separate from neighbor noise without human adjudication.

A query is flagged when  run_median > max(floor, baseline * 2 * calib_ratio)
with floor = 0.5 s (sub-half-second timings are scheduling jitter at
local[32], not signal). New queries (absent from the baseline) and
removed ones are listed informationally, never flagged.

Exit code 1 iff any query is flagged.
"""
import json
import sys

run_path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_queries.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_queries.json"

run = json.load(open(run_path))
base = json.load(open(base_path))

run_q = run["queries_median"]
base_q = base["queries_median"]
# the run is bracketed by two probes (calib_sec before the query loop,
# calib_end_sec after): contention arriving MID-RUN is invisible to the
# start probe alone, so the allowance scales by the worse of the two
run_calib = max(run.get("calib_sec", 0.2),
                run.get("calib_end_sec", run.get("calib_sec", 0.2)))
calib_ratio = max(run_calib / max(base.get("calib_sec", 0.2), 1e-9), 1.0)
FLOOR, FACTOR = 0.5, 2.0

flagged, improved = [], []
for name, sec in sorted(run_q.items()):
    b = base_q.get(name)
    if b is None:
        continue
    budget = max(FLOOR, b * FACTOR * calib_ratio)
    if sec > budget:
        flagged.append((name, sec, b, budget))
    elif b > FLOOR and sec < b / FACTOR:
        improved.append((name, sec, b))

new = sorted(set(run_q) - set(base_q))
gone = sorted(set(base_q) - set(run_q))

print(f"calib: run {run.get('calib_sec')}/{run.get('calib_end_sec')} "
      f"(start/end) vs baseline {base.get('calib_sec')}"
      f" -> allowance x{FACTOR * calib_ratio:.2f} (floor {FLOOR}s)")
# An end probe FAR above the start probe widens the allowance for the
# whole run — legitimate when contention arrived mid-run, but Bench's
# pre-probe settle (GC + pause) should keep run-induced residue out of
# it, so a big gap deserves eyes, not silent trust in the wider budget.
end_c = run.get("calib_end_sec")
if end_c is not None and end_c > 1.5 * run.get("calib_sec", 0.2):
    print(f"[ADJUDICATE] end probe {end_c} is >1.5x the start probe "
          f"{run.get('calib_sec')} — allowance widened to match; verify "
          f"mid-run contention (or re-run) rather than trusting the gate")
if new:
    print(f"new (unbaselined): {', '.join(new)}")
if gone:
    print(f"removed since baseline: {', '.join(gone)}")
for name, sec, b, budget in flagged:
    print(f"[REGRESSED] {name}: {sec:.2f}s vs baseline {b:.2f}s"
          f" (budget {budget:.2f}s)")
for name, sec, b in improved:
    print(f"[improved] {name}: {b:.2f}s -> {sec:.2f}s")
print(f"== {len(flagged)} regressed, {len(improved)} improved,"
      f" {len(run_q) - len(new)} compared ==")
sys.exit(1 if flagged else 0)
