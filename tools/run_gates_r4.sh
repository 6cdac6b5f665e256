#!/bin/bash
# Round-4 gate chain, crash-tolerant edition. The remote TPU worker
# drops routinely (liveness watchdog around remesh/compile bursts);
# every gate checkpoints, so retries are pure forward progress. A gate
# therefore retries indefinitely WHILE IT PROGRESSES, and gives up only
# after MAX_STUCK consecutive attempts that changed nothing on disk
# (restart files, scoreboard entries) - that distinguishes a wedged
# gate from a merely crash-prone one.
set -u
cd "$(dirname "$0")/.."
mkdir -p validation_runs
# pidfile lets bench.py preempt the chain: the axon TPU tunnel is
# exclusive, so the end-of-round bench must stop the live attempt
# (gates checkpoint + resume) and relaunch the chain when it is done.
ps -o pgid= $$ | tr -d " " > validation_runs/gates.pid
trap 'rm -f validation_runs/gates.pid' EXIT
LOG="validation_runs/gates_r4.log"
STALL_S=${STALL_S:-900}
MAX_STUCK=${MAX_STUCK:-4}
MAX_TRIES=${MAX_TRIES:-400}

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
  # run "$@" in the background, kill it if $LOG stops growing.
  # GNU timeout makes the attempt its own process-group leader, so
  # kills must target the GROUP (-$pid): killing only the timeout
  # process orphans the python child, which keeps holding the
  # exclusive TPU tunnel and wedges every later attempt.
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
    echo "=== GATE $name (attempt $i, stuck=$stuck/$MAX_STUCK) $(date -u +%H:%M:%S) ==="
    if run_guarded timeout 14400 python tools/run_gate.py "$name" "$@"; then
      echo "=== GATE $name OK ==="
      return 0
    fi
    if [ "$(fingerprint)" = "$fp_before" ]; then
      stuck=$((stuck + 1))
      if [ "$stuck" -ge "$MAX_STUCK" ]; then
        echo "=== GATE $name STUCK: $MAX_STUCK attempts with no progress — giving up ==="
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

# Interleaved stages: the 20 kyr spinup is run in 2 kyr instalments
# (each call resumes from the newest restart) so a single long gate can
# never starve the rest of the matrix of TPU time (round-3 failure mode).
run_gate antarctica 500
for t_spin in 2000 4000; do
  run_gate mismipplus_spinup "$t_spin"
done
# value-dense tail: fast scored matrices first, then the long legs.
# Every gate is resumable and run_gate.py persists restarts into the
# git-tracked persist/ tree, so wherever the round ends, the next round
# continues from there.
run_gate halfar_matrix
run_gate ismip_hom_matrix
run_gate parity ismip_hom
run_gate mismip_mod
for t_spin in 6000 8000 10000 12000; do
  run_gate mismipplus_spinup "$t_spin"
done
run_gate berends H_dHdt_flowline
run_gate berends H_dHdt_local
run_gate berends H_u_flowline
run_gate antarctica 2000
for t_spin in 14000 16000 18000 20000; do
  run_gate mismipplus_spinup "$t_spin"
done
run_gate mismipplus_ice1r
run_gate mismipplus_iceocean1r
run_gate ssa
run_gate parity mismipplus
run_gate parity mismip_mod
run_gate berends2 H_dHdt_flowline
run_gate berends2 H_dHdt_local
run_gate berends2 H_u_flowline
run_gate berends2 dHdt_invfric_invBMB
run_gate antarctica 5000
echo "=== ALL GATES DONE $(date -u) ==="
