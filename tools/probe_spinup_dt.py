"""Diagnose what limits dt and Krylov effort on the live MISMIP+ 5 km
spinup state: resume the gate's restart, run a short window with
UF_PC_DEBUG on, and report per-step dt / controller-vs-CFL / eta /
visc-its / Axb-its. Drives the round-5 solver-effort work (VERDICT r4
weak #2: 5-10x the reference's effort per sim-year).

Usage: UF_PC_DEBUG=1 python tools/probe_spinup_dt.py [years]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    years = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    from ufemism2_tpu.validation import integrated_tests as it
    from ufemism2_tpu.validation.integrated_tests import (
        REF_TESTS, _load, _mismip_resume_region)

    cfg = REF_TESTS / "idealised/MISMIPplus/config_01_5km_spinup_part0.cfg"
    C = _load(cfg, refgeo_idealised_MISMIPplus_Hi_init=100.0)
    out_dir = os.path.join(REPO, "validation_runs", "mismipplus_5km_spinup")
    r, resumed = _mismip_resume_region(C, out_dir)
    print(f"resumed={resumed} t={r.time:.1f} nV={r.mesh.nV}", flush=True)

    t0 = time.perf_counter()
    r.run_to(r.time + 2.0)          # compile + warm
    print(f"warm in {time.perf_counter() - t0:.1f}s", flush=True)

    a0, v0, s0 = int(r.state.n_Axb_its), int(r.state.n_visc_its), r.n_dt_ice
    t0 = time.perf_counter()
    r.run_to(r.time + years)
    wall = time.perf_counter() - t0
    axb = int(r.state.n_Axb_its) - a0
    visc = int(r.state.n_visc_its) - v0
    steps = r.n_dt_ice - s0
    print(json.dumps({
        "sim_yr_per_hr": years / wall * 3600.0, "wall_s": wall,
        "steps": steps, "visc": visc, "axb": axb,
        "dt_avg": years / max(steps, 1),
        "its_per_solve": axb / max(visc, 1),
        "visc_per_step": visc / max(steps, 1),
        "axb_per_simyr": axb / years}), flush=True)


if __name__ == "__main__":
    main()
