"""Checkpoint persister: every --interval seconds, copy each gate run
directory's newest VALID restart (+ json sidecars) into the git-tracked
validation_runs/persist/ tree.

Runs alongside the gate chain as an independent process so that
progress survives even attempts killed with SIGKILL (the stall watchdog
escalates to kill -9, which no in-process finally can catch). Unreadable
(torn) restarts report time=-inf and never overwrite a valid persisted
checkpoint.

Usage: python tools/persist_daemon.py [--interval 300]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    interval = 300.0
    if "--interval" in sys.argv:
        interval = float(sys.argv[sys.argv.index("--interval") + 1])
    from run_gate import _persist_restarts
    while True:
        try:
            _persist_restarts()
        except Exception as e:                        # pragma: no cover
            print(f"[persist] failed: {e}", flush=True)
        time.sleep(interval)


if __name__ == "__main__":
    main()
