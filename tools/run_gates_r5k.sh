#!/bin/bash
# Round-5 gate chain. Same crash-tolerant machinery as r4 (stall
# watchdog, fingerprint-based stuck detection, TPU liveness wait), plus
# band enforcement: run_gate.py exits 3 when a COMPLETED gate's cost
# functions violate their reference-anchored bands (tools/run_gate.py
# BANDS). Exit 3 is a terminal FAIL - the gate ran to completion and
# scored out of band - so the chain records it and moves on instead of
# retrying.
set -u
cd "$(dirname "$0")/.."
mkdir -p validation_runs
ps -o pgid= $$ | tr -d " " > validation_runs/gates.pid
trap 'rm -f validation_runs/gates.pid' EXIT
LOG="validation_runs/gates_r5.log"
STALL_S=${STALL_S:-900}
MAX_STUCK=${MAX_STUCK:-4}
MAX_TRIES=${MAX_TRIES:-400}
FAILED_GATES=""

fingerprint() {
  find validation_runs scoreboard -type f \
    \( -name '*.nc' -o -name '*.json' \) -printf '%p %s %T@\n' 2>/dev/null \
    | sort | md5sum | cut -d' ' -f1
}

wait_for_tpu() {
  while ! timeout 180 python -c \
      "import jax; assert jax.devices()[0].platform != 'cpu'" \
      > /dev/null 2>&1; do
    echo "tpu down, waiting $(date -u +%H:%M:%S)"
    sleep 240
  done
}

run_guarded() {
  "$@" &
  local pid=$!
  echo "$pid" > validation_runs/gate_attempt.pid
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
      kill -- -"$pid" 2>/dev/null
      sleep 5
      kill -9 -- -"$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      rm -f validation_runs/gate_attempt.pid
      return 99
    fi
  done
  local rc=0
  wait "$pid" || rc=$?
  rm -f validation_runs/gate_attempt.pid
  return $rc
}

run_gate() {
  local name="$1"; shift
  local stuck=0
  for i in $(seq 1 "$MAX_TRIES"); do
    wait_for_tpu
    local fp_before=$(fingerprint)
    echo "=== GATE $name $* (attempt $i, stuck=$stuck/$MAX_STUCK) $(date -u +%H:%M:%S) ==="
    run_guarded timeout 14400 python tools/run_gate.py "$name" "$@"
    local rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "=== GATE $name OK ==="
      return 0
    elif [ "$rc" -eq 3 ]; then
      echo "=== GATE $name COMPLETED OUT OF BAND (FAIL) ==="
      FAILED_GATES="$FAILED_GATES $name"
      return 3
    fi
    if [ "$(fingerprint)" = "$fp_before" ]; then
      stuck=$((stuck + 1))
      if [ "$stuck" -ge "$MAX_STUCK" ]; then
        echo "=== GATE $name STUCK: $MAX_STUCK attempts with no progress — giving up ==="
        FAILED_GATES="$FAILED_GATES $name(stuck)"
        return 1
      fi
    else
      stuck=0
    fi
    echo "=== GATE $name attempt $i failed — retrying ==="
    sleep 20
  done
  echo "=== GATE $name exhausted $MAX_TRIES attempts ==="
  return 1
}

# The MISMIP+ 20 kyr spinup is the round's headline deliverable

# Round-end continuation: the MISMIP+ spinup instalments only (resumed
# models never hit the fresh-build worker fault; every coupling interval
# checkpoints). The bench preempts this chain via gates.pid and
# relaunches it afterwards.
run_gate mismipplus_spinup 12000
run_gate mismipplus_spinup 14000
run_gate mismipplus_spinup 16000
run_gate mismipplus_spinup 18000
run_gate mismipplus_spinup 20000
run_gate mismipplus_ice1r
run_gate mismipplus_iceocean1r
echo "=== ALL GATES DONE $(date -u) failed:[$FAILED_GATES] ==="
