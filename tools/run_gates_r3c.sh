#!/bin/bash
# Round-3 resume chain with a stall guard: the axon tunnel can wedge a
# single client process indefinitely (dispatch never returns, healthy
# for new processes), so each attempt is killed and retried when the
# chain log stops growing for STALL_S seconds. Every gate is resumable
# from its restart files, so a retry continues rather than restarts.
set -u
cd "$(dirname "$0")/.."
mkdir -p validation_runs
LOG="validation_runs/gates_r3b.log"
STALL_S=${STALL_S:-900}

run_guarded() {
  # run "$@" in the background, kill it if $LOG stops growing
  "$@" &
  local pid=$!
  local last_size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  local last_t=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    local cur=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    local now=$(date +%s)
    if [ "$cur" != "$last_size" ]; then
      last_size=$cur; last_t=$now
    elif [ $((now - last_t)) -ge "$STALL_S" ]; then
      echo "=== STALL: no log growth for ${STALL_S}s, killing attempt ==="
      kill "$pid" 2>/dev/null
      sleep 5
      kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 99
    fi
  done
  wait "$pid"
}

wait_for_tpu() {
  # Block until the tunnel serves a real TPU: attempts made while the
  # tunnel is down fail in ~2 min and burn the whole retry budget
  # (gates_r3b.log, 2026-08-18) — wait instead of counting those.
  while ! timeout 180 python -c \
      "import jax; assert jax.devices()[0].platform != 'cpu'" \
      > /dev/null 2>&1; do
    echo "tpu down, waiting $(date -u +%H:%M:%S)"
    sleep 240
  done
}

run_gate() {
  local name="$1"; shift
  local tries="$1"; shift
  for i in $(seq 1 "$tries"); do
    wait_for_tpu
    echo "=== GATE $name (attempt $i/$tries) $(date -u +%H:%M:%S) ==="
    if run_guarded timeout 14400 python tools/run_gate.py "$name" "$@"; then
      echo "=== GATE $name OK ==="
      return 0
    fi
    echo "=== GATE $name attempt $i failed (rc=$?) — retrying ==="
    sleep 30
  done
  echo "=== GATE $name GAVE UP after $tries attempts ==="
  return 1
}

run_gate mismipplus_spinup 30
run_gate mismipplus_ice1r 8
run_gate ssa 6
run_gate mismip_mod 12
run_gate berends 4 H_dHdt_flowline
run_gate berends 4 H_dHdt_local
run_gate berends 4 H_u_flowline
run_gate berends2 4 H_dHdt_flowline
run_gate berends2 4 H_dHdt_local
run_gate berends2 4 H_u_flowline
run_gate berends2 4 dHdt_invfric_invBMB
run_gate ismip_hom_matrix 8
echo "=== ALL GATES DONE $(date -u) ==="
