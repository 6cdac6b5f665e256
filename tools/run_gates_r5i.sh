#!/bin/bash
set -u
cd "$(dirname "$0")/.."
LOG="validation_runs/gates_r5.log"
# last-hour sprint: complete a small-scale MISMIP_mod hysteresis chain
# (leg dirs resume; scale tag recorded honestly), then a shortened
# Berends nudging leg; no retry machinery - single attempts, bounded
timeout 4200 python tools/run_gate.py mismip_mod 0.05
timeout 2400 python tools/run_gate.py berends H_dHdt_flowline 1500 800
timeout 3000 python tools/run_gate.py mismipplus_spinup 12000
echo "=== SPRINT DONE $(date -u) ==="
