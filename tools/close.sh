#!/bin/bash
# Round-close gate: the snapshot commit is REFUSED while the tree is
# dirty or any gate is red. Runs the full local gate (compile + specs +
# Verify/DuckDB compare + bench + contention-adjusted regress), then
# refreshes BASELINE_queries.json from the bench run and commits it —
# so regress.py always diffs against a baseline that moved with the
# query surface. Run as the LAST action of every round.
#
# Exit nonzero = do not close the round on this tree.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ -n "$(git status --porcelain)" ]]; then
  echo "close.sh: working tree is DIRTY — commit or stash first:" >&2
  git status --short >&2
  exit 1
fi

tools/check.sh --bench

# Refresh the per-query baseline from the run check.sh just produced
# (only after every gate above was green). rebaseline.py clamps the
# QUIET_REF.json-adjudicated queries so a contended closing run can
# never ratchet a regress denominator upward (r16 verdict finding).
python3 tools/rebaseline.py target/bench_queries.json BASELINE_queries.json
if [[ -n "$(git status --porcelain BASELINE_queries.json)" ]]; then
  git add BASELINE_queries.json
  git commit -m "Refresh per-query bench baseline at round close"
fi

echo "CLOSE GATE GREEN — safe to snapshot"
