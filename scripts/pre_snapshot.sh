#!/bin/bash
# Mandatory pre-snapshot gate (VERDICT r3 next-round item 1d).
#
# Run BEFORE any end-of-round / kernel-touching commit.  Refuses (rc=1)
# unless ALL of:
#   1. scripts/lowering_gate.py    — Mosaic lowering on production shapes
#   2. scripts/check_dense_tpu.py  — on-chip dense kernel smoke (4 shapes)
#   3. python -m pytest tests/ -q  — full suite
#   4. python bench.py             — full bench, rc=0 with JSON output
# pass.  Rounds 2 and 3 both ended rc=1 because an untested kernel change
# was committed last; this script exists so that can never happen again.
set -u
cd "$(dirname "$0")/.."
fail=0

run() {
    echo "=== pre_snapshot: $* ==="
    if ! timeout 1200 "$@"; then
        echo "=== pre_snapshot: FAILED: $* ==="
        fail=1
    fi
}

run python scripts/lowering_gate.py
run python scripts/check_dense_tpu.py
run python -m pytest tests/ -q
run python bench.py

if [ "$fail" -ne 0 ]; then
    echo "pre_snapshot: REFUSING — fix the failures above before committing."
    exit 1
fi
echo "pre_snapshot: ALL GATES GREEN"
