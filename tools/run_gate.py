"""Run ONE full-tier integrated-test gate and write its scoreboard entry.

Usage: python tools/run_gate.py <gate> [args...]

Gates (VERDICT r2 items 2/5/7 — the reference's own test matrix,
automated_testing/integrated_tests/):
  mismipplus_spinup [end_time]   5 km spinup w/ flow-factor tuning
  mismipplus_ice1r               retreat leg from the spinup restart
  halfar5                        Halfar dome 5 km / 200 yr
  ssa                            SSA_icestream 32/16/8/4 km
  mismip_mod [scale]             4-leg hysteresis chain (resumable)
  berends <method>               Berends2023 nudging experiment I
  ismip_hom_matrix               A-D x SIASSA/DIVA/BPA x 6 lengths

Each gate is resumable where the physics allows it; the companion
driver tools/run_gates.sh retries each gate in a fresh process so a
remote-TPU worker crash resumes instead of restarting."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCOREBOARD = os.path.join(os.path.dirname(__file__), "..", "scoreboard")
RUNS = os.path.join(os.path.dirname(__file__), "..", "validation_runs")


def _restart_time(p):
    import numpy as np
    from ufemism2_tpu.io.ncio import NCFile
    try:
        with NCFile(p) as nc:
            return float(np.asarray(nc.read("time")).reshape(-1)[0])
    except Exception:
        return -float("inf")


def _persist_restarts():
    """Copy each run directory's newest restart (+ small json sidecars:
    tuned flow factor, GL series, leg bookkeeping) into the git-tracked
    persist/ tree: run artifacts are gitignored, so a VM reset between
    rounds would otherwise throw away hours of gate progress (round-4
    lesson: the spinup restart vanished with the VM)."""
    import glob
    import shutil

    per_root = os.path.join(RUNS, "persist")
    for src_dir, _dirs, files in os.walk(RUNS):
        rel = os.path.relpath(src_dir, RUNS)
        if rel.startswith("persist"):
            continue
        restarts = [f for f in files if f.startswith("restart_ANT_")
                    and f.endswith(".nc")]
        if not restarts:
            continue
        newest = max((os.path.join(src_dir, f) for f in restarts),
                     key=_restart_time)
        t_new = _restart_time(newest)
        dst_dir = os.path.join(per_root, rel)
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, "restart_ANT_00001.nc")
        if not os.path.exists(dst) or _restart_time(dst) < t_new:
            shutil.copy(newest, dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            print(f"[gate] persisted {rel} restart t={t_new:.1f}",
                  flush=True)
        for f in files:
            if f.endswith(".json"):
                shutil.copy(os.path.join(src_dir, f),
                            os.path.join(dst_dir, f))


def _seed_from_persist():
    """Inverse of _persist_restarts: on a fresh VM (no run artifacts)
    resume every persisted run directory from its committed
    checkpoint."""
    import glob
    import shutil

    per_root = os.path.join(RUNS, "persist")
    if not os.path.isdir(per_root):
        return
    for dst_dir, _dirs, files in os.walk(per_root):
        if "restart_ANT_00001.nc" not in files:
            continue
        rel = os.path.relpath(dst_dir, per_root)
        src_dir = os.path.join(RUNS, rel)
        if glob.glob(os.path.join(src_dir, "restart_ANT_*.nc")):
            continue
        os.makedirs(src_dir, exist_ok=True)
        for f in files:
            shutil.copy(os.path.join(dst_dir, f), os.path.join(src_dir, f))
        print(f"[gate] seeded {rel} from persisted restart", flush=True)


def main():
    gate = sys.argv[1]
    args = sys.argv[2:]
    from ufemism2_tpu.validation import integrated_tests as it

    _seed_from_persist()
    if gate == "mismipplus_spinup":
        end = float(args[0]) if args else None
        run = it.run_mismipplus_spinup(
            os.path.join(RUNS, "mismipplus_5km_spinup"), SCOREBOARD,
            end_time=end)
    elif gate == "mismipplus_ice1r":
        run = it.run_mismipplus_ice1r(
            os.path.join(RUNS, "mismipplus_5km_spinup"),
            os.path.join(RUNS, "mismipplus_5km_ice1r"), SCOREBOARD)
    elif gate == "mismipplus_iceocean1r":
        run = it.run_mismipplus_iceocean1r(
            os.path.join(RUNS, "mismipplus_5km_spinup"),
            os.path.join(RUNS, "mismipplus_5km_iceocean1r"), SCOREBOARD)
    elif gate == "halfar5":
        run = it.run_halfar(SCOREBOARD, resolution_km=5,
                            output_dir=os.path.join(RUNS, "halfar_5km"))
    elif gate == "halfar_matrix":
        runs = it.run_halfar_matrix(SCOREBOARD)
        for r in runs:
            print(r.summary(), flush=True)
        return
    elif gate == "ssa":
        run = it.run_ssa_icestream(SCOREBOARD)
    elif gate == "mismip_mod":
        scale = float(args[0]) if args else 1.0
        run = it.run_mismip_mod(SCOREBOARD,
                                output_dir=os.path.join(RUNS, "mismip_mod"),
                                scale=scale)
    elif gate == "berends":
        method = args[0] if args else "H_dHdt_flowline"
        run = it.run_berends_nudging(method=method,
                                     scoreboard_dir=SCOREBOARD)
    elif gate == "berends2":
        method = args[0] if args else "H_dHdt_flowline"
        run = it.run_berends_exp_II(method=method,
                                    scoreboard_dir=SCOREBOARD)
    elif gate == "antarctica":
        end = float(args[0]) if args else 2000.0
        run = it.run_antarctica_40km(
            os.path.join(RUNS, "antarctica_40km"), SCOREBOARD,
            end_time=end)
    elif gate == "ismip_hom_matrix":
        runs = it.run_ismip_hom_matrix(SCOREBOARD)
        for r in runs:
            print(r.summary(), flush=True)
        return
    elif gate == "parity":
        # reference-output parity harness (tools/compare_vs_reference.py)
        # driven per-suite so the chain can interleave it
        import subprocess
        which = args or ["mismipplus", "mismip_mod", "ismip_hom"]
        rc = subprocess.call(
            [sys.executable,
             os.path.join(os.path.dirname(__file__),
                          "compare_vs_reference.py")] + which + ["--write"])
        if rc != 0:
            raise SystemExit(rc)
        return
    else:
        raise SystemExit(f"unknown gate '{gate}'")
    print(run.summary(), flush=True)


if __name__ == "__main__":
    # the chain's stall watchdog SIGTERMs wedged attempts; convert that
    # to SystemExit so the finally-persist below still runs (default
    # SIGTERM handling skips finally, which is how round 4 lost 1100
    # model-years of spinup progress)
    import signal

    def _term(_sig, _frm):                            # pragma: no cover
        raise SystemExit(143)
    signal.signal(signal.SIGTERM, _term)
    try:
        main()
    finally:
        # persist newest restarts whether the attempt succeeded or the
        # worker dropped mid-gate: crashed progress is still progress
        try:
            _persist_restarts()
        except Exception as e:                        # pragma: no cover
            print(f"[gate] persist failed: {e}", flush=True)
