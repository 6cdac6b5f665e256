"""A/B probe of stress-balance solver configurations on the real TPU.

Runs a short MISMIP 8 km DIVA window (the bench/north-star config) per
case IN A SUBPROCESS (a worker crash kills the case, not the sweep) and
prints one summary line each: sim-yr/hr, its/solve, visc its/step,
ms/Krylov-it. Cases cover the preconditioner ladder (2x2 block-Jacobi /
dense 64-block / two-level coarse correction) x the x-operand split
(bf16-rounded vs exact) x the SpMV layout (tiled einsum vs the Pallas
bucket-grouped kernel). Results drive the round's defaults
(PERF_NOTES.md).

Usage: python tools/probe_solver.py [years] [case ...]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = {
    # name: (env overrides, config overrides)
    "bj_xnone":       ({"UF_X_SPLIT": "none"}, {}),
    "bj_xbits":       ({"UF_X_SPLIT": "bits"}, {}),
    "two_level_xnone": ({"UF_X_SPLIT": "none"},
                        {"tpu_stress_balance_precond": "two_level"}),
    "two_level_xbits": ({"UF_X_SPLIT": "bits"},
                        {"tpu_stress_balance_precond": "two_level"}),
    "bj_pallas":      ({"UF_X_SPLIT": "none", "UF_M2_LAYOUT": "pallas"}, {}),
    "two_level_pallas": ({"UF_X_SPLIT": "none", "UF_M2_LAYOUT": "pallas"},
                         {"tpu_stress_balance_precond": "two_level"}),
}

CHILD = r'''
import json, sys, time
years = float(sys.argv[1])
cfg_over = json.loads(sys.argv[2])
from ufemism2_tpu.config import load_config
from ufemism2_tpu.main.region import ModelRegion
C = load_config("/root/reference/config-files/"
                "config_MISMIP_8km_spinup_for_scaling.cfg",
                tpu_precision="f32", allow_mesh_updates=False, **cfg_over)
t0 = time.perf_counter()
r = ModelRegion(C, "ANT")
r.run_to(20.0)                      # warm-up + compile + transient
warm = time.perf_counter() - t0
a0, v0, s0 = int(r.state.n_Axb_its), int(r.state.n_visc_its), r.n_dt_ice
t0 = time.perf_counter()
r.run_to(20.0 + years)
wall = time.perf_counter() - t0
axb = int(r.state.n_Axb_its) - a0
visc = int(r.state.n_visc_its) - v0
steps = r.n_dt_ice - s0
print(json.dumps({
    "sim_yr_per_hr": years / wall * 3600.0, "wall_s": wall,
    "steps": steps, "visc": visc, "axb": axb,
    "its_per_solve": axb / max(visc, 1),
    "visc_per_step": visc / max(steps, 1),
    "ms_per_axb": wall * 1e3 / max(axb, 1), "warm_s": warm}),
    flush=True)
'''


def main():
    years = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    names = sys.argv[2:] or list(CASES)
    results = {}
    for name in names:
        env_over, cfg_over = CASES[name]
        env = dict(os.environ, **env_over)
        print(f"=== CASE {name} {env_over} {cfg_over} ===", flush=True)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", CHILD, str(years), json.dumps(cfg_over)],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=3600)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        try:
            r = json.loads(line)
            results[name] = r
            print(f"[{name}] {r['sim_yr_per_hr']:.0f} sim-yr/hr | "
                  f"{r['its_per_solve']:.0f} its/solve | "
                  f"{r['visc_per_step']:.1f} visc/step | "
                  f"{r['ms_per_axb']:.2f} ms/axb | warm {r['warm_s']:.0f}s",
                  flush=True)
        except Exception:
            tail = (p.stderr or "")[-1500:]
            print(f"[{name}] FAILED rc={p.returncode} ({time.time()-t0:.0f}s)"
                  f"\n{tail}", flush=True)
    out = os.path.join(REPO, "validation_runs", "probe_solver.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
