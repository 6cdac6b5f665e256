"""Benchmark: ice-sheet model throughput on the current device.

Runs in f32 performance mode (tile-blocked ELL operators; accuracy vs the
analytic Halfar solution is reported in `extra` and matches the f64 parity
mode to well under the discretisation error).

Runs the Halfar-dome 40 km SIA evolution (the reference's
it_ideal_Hlf_dome_Halfar_40km integrated test, 500 model years) end-to-end
— mesh build, operator construction, jitted predictor-corrector stepping —
and reports simulated-years-per-wall-hour of the stepping loop.

vs_baseline normalises by an estimated reference throughput for the same
run: the reference CI performs it in 606 ice-dynamics steps (scoreboard
it_ideal_Hlf_dome_Halfar_40km); at a measured ~50 ms/step for the 2-rank
Fortran build that is ~30 s of stepping for 500 sim-years, i.e. ~6.0e4
sim-yr/hr. (The reference publishes no wall-clock numbers; this anchor is
held fixed across rounds so the trend is comparable.)
"""

import json
import time

REFERENCE_SIM_YR_PER_HR = 6.0e4


def main():
    import jax
    import numpy as np
    from ufemism2_tpu.config import load_config
    from ufemism2_tpu.main.region import ModelRegion
    from ufemism2_tpu.core.analytical import halfar_H

    cfg = ("/root/reference/automated_testing/integrated_tests/idealised/"
           "Halfar_dome/config_Halfar_40km.cfg")
    try:
        C = load_config(cfg, tpu_precision="f32")
    except FileNotFoundError:
        from ufemism2_tpu.config import Config
        C = Config(
            choice_refgeo_init_ANT="idealised",
            choice_refgeo_init_idealised="Halfar",
            dx_refgeo_init_idealised=1e4,
            refgeo_idealised_Halfar_H0=3000.0,
            refgeo_idealised_Halfar_R0=500e3,
            uniform_Glens_flow_factor=1e-16,
            choice_stress_balance_approximation="SIA",
            choice_sliding_law="no_sliding",
            xmin_ANT=-1000e3, xmax_ANT=1000e3,
            ymin_ANT=-1000e3, ymax_ANT=1000e3,
            maximum_resolution_uniform=800e3,
            maximum_resolution_grounded_ice=400e3,
            maximum_resolution_ice_front=40e3, ice_front_width=40e3,
            end_time_of_run=500.0, tpu_precision="f32")

    region = ModelRegion(C, "ANT")
    # warm up the jit (one step), then time the rest of the run
    region.run_to(min(1.0, C.end_time_of_run))
    t0 = time.perf_counter()
    t_start = region.time
    state = region.run_to(C.end_time_of_run)
    wall = time.perf_counter() - t0
    sim_years = C.end_time_of_run - t_start

    Hi = np.asarray(state.Hi)
    Hex = halfar_H(C.uniform_Glens_flow_factor, C.Glens_flow_law_exponent,
                   C.refgeo_idealised_Halfar_H0, C.refgeo_idealised_Halfar_R0,
                   region.mesh.V[:, 0], region.mesh.V[:, 1],
                   C.end_time_of_run)
    rmse = float(np.sqrt(((Hi - Hex) ** 2).mean()))

    sim_yr_per_hr = sim_years / wall * 3600.0
    print(json.dumps({
        "metric": "halfar_40km_sim_years_per_wall_hour",
        "value": round(sim_yr_per_hr, 1),
        "unit": "sim_yr/hr",
        "vs_baseline": round(sim_yr_per_hr / REFERENCE_SIM_YR_PER_HR, 3),
        "extra": {
            "rmse_Hi_vs_analytic_m": round(rmse, 2),
            "reference_rmse_m": 34.85,
            "n_steps": region.n_dt_ice,
            "reference_n_steps": 606,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
