#!/bin/bash
set -u
cd "$(dirname "$0")/.."
timeout 1500 python tools/run_gate.py mismip_mod 0.05 1
timeout 2400 python tools/run_gate.py mismip_mod 0.05 2
timeout 2400 python tools/run_gate.py mismip_mod 0.05 3
timeout 2400 python tools/run_gate.py mismip_mod 0.05 4
echo "=== MISMIP_MOD LEGS DONE $(date -u) ==="
