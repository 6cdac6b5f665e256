#!/bin/bash
# Round-3 resume chain: TPU came back after the snapshot; halfar5 is
# already scored (79c236c), SSA has the 16 km tier only. Run the
# remaining gates in value order.
set -u
cd "$(dirname "$0")/.."
mkdir -p validation_runs

run_gate() {
  local name="$1"; shift
  local tries="$1"; shift
  for i in $(seq 1 "$tries"); do
    echo "=== GATE $name (attempt $i/$tries) $(date -u +%H:%M:%S) ==="
    if timeout 14400 python tools/run_gate.py "$name" "$@"; then
      echo "=== GATE $name OK ==="
      return 0
    fi
    echo "=== GATE $name attempt $i failed (rc=$?) — retrying ==="
    sleep 30
  done
  echo "=== GATE $name GAVE UP after $tries attempts ==="
  return 1
}

run_gate mismipplus_spinup 8
run_gate mismipplus_ice1r 6
run_gate ssa 4
run_gate mismip_mod 8
run_gate berends 3 H_dHdt_flowline
run_gate berends 3 H_dHdt_local
run_gate berends 3 H_u_flowline
run_gate ismip_hom_matrix 6
echo "=== ALL GATES DONE $(date -u) ==="
