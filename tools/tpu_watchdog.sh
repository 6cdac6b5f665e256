#!/bin/bash
# Wait for the axon TPU tunnel to come back, then run (in order):
#   1. the solver A/B probe (tools/probe_solver.py, ~30 min)
#   2. the full-tier gate chain (tools/run_gates.sh, hours)
# Detached launch:
#   setsid nohup bash tools/tpu_watchdog.sh > validation_runs/watchdog.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p validation_runs

echo "=== TPU watchdog started $(date -u) ==="
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
       > /dev/null 2>&1; then
    echo "=== TPU back $(date -u) ==="
    break
  fi
  echo "tpu still down $(date -u +%H:%M:%S)"
  sleep 240
done

echo "=== probe_solver $(date -u) ==="
timeout 7200 python tools/probe_solver.py 20 2>&1 | tail -40

echo "=== gates $(date -u) ==="
bash tools/run_gates.sh

echo "=== bench $(date -u) ==="
timeout 7200 python bench.py 2>&1 | tail -5
echo "=== watchdog done $(date -u) ==="
