#!/bin/bash
# Mandatory pre-snapshot gate (VERDICT r3 item 1d; r4 item 1b).
#
# Run BEFORE any end-of-round / kernel-touching commit.  Runs ALL of:
#   1. scripts/lowering_gate.py    — Mosaic lowering on production shapes
#   2. scripts/check_dense_tpu.py  — on-chip dense kernel smoke (4 shapes)
#   3. python -m pytest tests/ -q  — full suite
#   4. python bench.py             — full bench, rc=0 with JSON output
# and writes GATE_r05.json (per-gate rc + output tail + timestamp + HEAD
# sha + dirty flag) so the gate leaves committed EVIDENCE: a snapshot
# whose GATE artifact is missing, stale, or red is self-evidently
# ungated.  Exits rc=1 if any gate failed.
#
# Rounds 2–4 all ended with an untested last-minute change; this script
# + the committed artifact exist so that can never happen invisibly
# again.
set -u
cd "$(dirname "$0")/.."

ARTIFACT="GATE_r05.json"
TMPDIR_GATE=$(mktemp -d)
trap 'rm -rf "$TMPDIR_GATE"' EXIT
fail=0
declare -a NAMES RCS LOGS SECS

run() {
    local name="$1"; shift
    echo "=== pre_snapshot: $name: $* ==="
    local log="$TMPDIR_GATE/$name.log"
    local t0=$SECONDS
    timeout 2400 "$@" 2>&1 | tee "$log"
    local rc=${PIPESTATUS[0]}
    local dt=$((SECONDS - t0))
    if [ "$rc" -ne 0 ]; then
        echo "=== pre_snapshot: FAILED (rc=$rc): $name ==="
        fail=1
    fi
    NAMES+=("$name"); RCS+=("$rc"); LOGS+=("$log"); SECS+=("$dt")
}

run lowering_gate python scripts/lowering_gate.py
run dense_tpu_smoke python scripts/check_dense_tpu.py
run pytest python -m pytest tests/ -q
run bench python bench.py

# ---- write the evidence artifact -------------------------------------
python - "$ARTIFACT" "$fail" <<'EOF' "${NAMES[@]}" --- "${RCS[@]}" --- "${SECS[@]}" --- "${LOGS[@]}"
import json, subprocess, sys, datetime
artifact, fail = sys.argv[1], int(sys.argv[2])
rest = sys.argv[3:]
parts, cur = [], []
for a in rest:
    if a == "---":
        parts.append(cur); cur = []
    else:
        cur.append(a)
parts.append(cur)
names, rcs, secs, logs = parts
head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                      text=True).stdout.strip()
dirty = bool(subprocess.run(["git", "status", "--porcelain"],
                            capture_output=True, text=True).stdout.strip())
gates = []
for n, rc, dt, lg in zip(names, rcs, secs, logs):
    try:
        tail = open(lg, errors="replace").read()[-2000:]
    except OSError:
        tail = "<no log>"
    gates.append({"gate": n, "rc": int(rc), "seconds": int(dt),
                  "tail": tail})
out = {
    "round": 5,
    "timestamp_utc": datetime.datetime.now(datetime.UTC).isoformat(),
    "head_sha_when_run": head,
    "tree_dirty_when_run": dirty,
    "all_green": fail == 0,
    "gates": gates,
}
json.dump(out, open(artifact, "w"), indent=1)
print(f"pre_snapshot: wrote {artifact} (all_green={fail == 0})")
EOF

if [ "$fail" -ne 0 ]; then
    echo "pre_snapshot: REFUSING — fix the failures above before committing."
    exit 1
fi
echo "pre_snapshot: ALL GATES GREEN — commit $ARTIFACT with the snapshot."
