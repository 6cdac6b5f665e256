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


def _persist_spinup_restart():
    """Copy the newest spinup restart (+ tuned flow factor) into the
    git-tracked persist/ folder: run artifacts are gitignored, so a VM
    reset between rounds would otherwise throw away days of spinup
    progress (round-4 lesson: the t=550 restart vanished with the VM)."""
    import glob
    import shutil
    import numpy as np
    from ufemism2_tpu.io.ncio import NCFile

    src_dir = os.path.join(RUNS, "mismipplus_5km_spinup")
    dst_dir = os.path.join(RUNS, "persist")
    restarts = glob.glob(os.path.join(src_dir, "restart_ANT_*.nc"))
    if not restarts:
        return

    def _rt(p):
        try:
            with NCFile(p) as nc:
                return float(np.asarray(nc.read("time")).reshape(-1)[0])
        except Exception:
            return -np.inf
    newest = max(restarts, key=_rt)
    t_new = _rt(newest)
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, "restart_spinup_ANT.nc")
    if not os.path.exists(dst) or _rt(dst) < t_new:
        shutil.copy(newest, dst + ".tmp")
        os.replace(dst + ".tmp", dst)
        print(f"[gate] persisted spinup restart t={t_new:.1f}", flush=True)
    sf = os.path.join(src_dir, "glen_A_scale.json")
    if os.path.exists(sf):
        shutil.copy(sf, os.path.join(dst_dir, "glen_A_scale.json"))


def _seed_spinup_from_persist():
    """Inverse of _persist_spinup_restart: on a fresh VM (no run
    artifacts) restart the spinup from the committed checkpoint."""
    import glob
    import shutil

    src_dir = os.path.join(RUNS, "mismipplus_5km_spinup")
    per = os.path.join(RUNS, "persist", "restart_spinup_ANT.nc")
    if glob.glob(os.path.join(src_dir, "restart_ANT_*.nc")) \
            or not os.path.exists(per):
        return
    os.makedirs(src_dir, exist_ok=True)
    shutil.copy(per, os.path.join(src_dir, "restart_ANT_00001.nc"))
    sf = os.path.join(RUNS, "persist", "glen_A_scale.json")
    if os.path.exists(sf):
        shutil.copy(sf, os.path.join(src_dir, "glen_A_scale.json"))
    print("[gate] seeded spinup from persisted restart", flush=True)


def main():
    gate = sys.argv[1]
    args = sys.argv[2:]
    from ufemism2_tpu.validation import integrated_tests as it

    if gate == "mismipplus_spinup":
        end = float(args[0]) if args else None
        _seed_spinup_from_persist()
        run = it.run_mismipplus_spinup(
            os.path.join(RUNS, "mismipplus_5km_spinup"), SCOREBOARD,
            end_time=end)
        _persist_spinup_restart()
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
    else:
        raise SystemExit(f"unknown gate '{gate}'")
    print(run.summary(), flush=True)


if __name__ == "__main__":
    main()
