"""Standalone LADDIE program.

Re-design of src/LADDIE/main/LADDIE_program.f90 +
src/LADDIE/forcing/laddie_forcing_main.f90 (initialise_forcing): build the
mesh from the PD reference geometry, derive the ice masks, assemble the
plume forcing (ice draft + ambient ocean T/S profiles), then integrate the
one-layer plume to quasi-steady state and write mesh + scalar output.

Usage:
    python -m ufemism2_tpu laddie <config.cfg> [--output-dir DIR]
"""

from __future__ import annotations

import time as _time
from pathlib import Path

import numpy as np

from ..config import load_config
from ..utils.logging_utils import happy, routine


def run_laddie_standalone(config_path: str, output_dir: str | None = None,
                          region: str = "ANT"):
    import jax.numpy as jnp
    from ..mesh.creation import build_mesh_from_config
    from ..core.mesh_data import build_mesh_data
    from ..core.idealised_geometries import calc_idealised_geometry
    from ..core.ice.masks import determine_masks
    from ..models.ocean import make_run_ocean, ocean_depth_axis
    from ..models.laddie import (laddie_masks, make_laddie_step,
                                 init_laddie_state, run_laddie_leg,
                                 run_laddie_leg_with_diag)
    from ..core.ice.state import init_ice_state
    from ..io.output_files import MeshOutputFile, ScalarOutputFile

    C = load_config(config_path)
    out = Path(output_dir or C.fixed_output_dir or "results_laddie")
    out.mkdir(parents=True, exist_ok=True)
    (out / Path(config_path).name).write_text(Path(config_path).read_text())

    with routine("LADDIE_program/initialise_forcing"):
        mesh = build_mesh_from_config(C, region)
        md = build_mesh_data(mesh)
        choice = getattr(C, f"choice_refgeo_PD_{region}")
        if choice == "idealised" or not Path(
                getattr(C, f"filename_refgeo_PD_{region}", "")).exists():
            sub = (C.choice_refgeo_PD_idealised
                   or C.choice_refgeo_init_idealised)
            Hi, Hb, Hs, SL = calc_idealised_geometry(
                mesh.V[:, 0], mesh.V[:, 1], sub, C)
            Hi = np.where(Hi < C.refgeo_Hi_min, 0.0, Hi)
        else:
            from ..io.input_files import read_geometry_onto_mesh
            Hi, Hb, SL = read_geometry_onto_mesh(C, region, mesh, which="PD")
        state = init_ice_state(md, Hi, Hb, SL, nz=C.nz, dt_init=C.dt_ice_min)
        masks = determine_masks(md, state.Hi, state.Hb, state.SL)
        lm = laddie_masks(md, masks)

    with routine("LADDIE_program/initialise_laddie_model"):
        run_ocean = make_run_ocean(C, md, region)
        ocean = run_ocean(0.0, state)
        forcing = {
            "Hib": state.Hib,
            "dHib_dx_b": md.M_ddx_a_b @ state.Hib,
            "dHib_dy_b": md.M_ddy_a_b @ state.Hib,
            "Ti_base": state.Ti[:, 0] - 273.15,   # degC (forcing_main:169)
            "use_Ti": jnp.asarray(False),
            "z_ocean": jnp.asarray(ocean_depth_axis(C), md.A.dtype),
            "T_ocean": ocean["T"], "S_ocean": ocean["S"],
        }
        from ..models.laddie import make_calc_SGD
        calc_sgd = make_calc_SGD(C, md)
        if calc_sgd is not None:
            forcing["SGD"] = calc_sgd(masks["mask_floating_ice"],
                                      masks["mask_gl_fl"],
                                      C.start_time_of_run)
        step_fn = make_laddie_step(C, md)
        lst = init_laddie_state(C, md, lm, forcing)

    duration = C.time_duration_laddie_init or C.time_duration_laddie
    n_shelf = int(np.asarray(lm.a).sum())
    happy("LADDIE standalone: {} shelf vertices, integrating {} days ...",
          n_shelf, duration)

    # the reference's laddie_mesh_output.f90 field set (geometry +
    # plume state + melt diagnostics)
    mesh_out = MeshOutputFile(
        str(out / "laddie_output_fields_mesh.nc"), mesh,
        fields=["H_lad", "U_lad", "V_lad", "T_lad", "S_lad", "melt",
                "entr", "detr", "gamma_T", "T_base", "T_amb", "S_amb",
                "Hib", "Hi", "TAF"])
    scal_out = ScalarOutputFile(
        str(out / "laddie_scalar_output.nc"),
        fields=["melt_mean", "melt_max", "melt_tot_Gt", "entr_tot_Sv",
                "layer_volume_km3", "T_mean", "T_min", "T_max",
                "S_mean", "S_min", "S_max"])

    t0 = _time.time()
    # output cadence: C%dt_output (days within the standalone run,
    # LADDIE_main_model.f90:200)
    n_legs = max(1, int(np.ceil(duration / max(C.dt_output, 1e-9)))) \
        if C.dt_output and C.dt_output < duration else 1
    leg_days = duration / n_legs
    area = np.asarray(md.A)
    shelf = np.asarray(lm.a)
    from ..utils.constants import sec_per_year
    for i in range(n_legs):
        lst, melt, diag = run_laddie_leg_with_diag(C, md, lst, lm, forcing,
                                                   leg_days, step_fn)
        t_days = (i + 1) * leg_days
        melt_np = np.asarray(melt)
        mesh_out.write(t_days, {
            "H_lad": np.asarray(lst.H), "U_lad": np.asarray(md.M_map_b_a
                                                            @ lst.U),
            "V_lad": np.asarray(md.M_map_b_a @ lst.V),
            "T_lad": np.asarray(lst.T), "S_lad": np.asarray(lst.S),
            "melt": melt_np,
            "entr": np.asarray(diag["entr"]) * sec_per_year,
            "detr": np.asarray(diag["detr"]) * sec_per_year,
            "gamma_T": np.asarray(diag["gamma_T"]),
            "T_base": np.asarray(diag["T_base"]),
            "T_amb": np.asarray(diag["T_amb"]),
            "S_amb": np.asarray(diag["S_amb"]),
            "Hib": np.asarray(state.Hib), "Hi": np.asarray(state.Hi),
            "TAF": np.asarray(state.TAF)})
        wshelf = area * shelf
        mean_melt = float((melt_np * wshelf).sum() / max(wshelf.sum(), 1e-30))
        H_np = np.asarray(lst.H)
        T_np = np.asarray(lst.T)[shelf > 0]
        S_np = np.asarray(lst.S)[shelf > 0]
        entr_np = np.asarray(diag["entr"]) * sec_per_year
        scal_out.write(t_days, {
            "melt_mean": mean_melt,
            "melt_max": float(melt_np.max()),
            "melt_tot_Gt": float((melt_np * wshelf).sum() * 917e-12),
            # reference laddie_scalar_output.f90 buffer set
            "entr_tot_Sv": float((entr_np / sec_per_year
                                  * wshelf).sum() / 1e6),
            "layer_volume_km3": float((H_np * wshelf).sum() / 1e9),
            "T_mean": float(T_np.mean()) if len(T_np) else 0.0,
            "T_min": float(T_np.min()) if len(T_np) else 0.0,
            "T_max": float(T_np.max()) if len(T_np) else 0.0,
            "S_mean": float(S_np.mean()) if len(S_np) else 0.0,
            "S_min": float(S_np.min()) if len(S_np) else 0.0,
            "S_max": float(S_np.max()) if len(S_np) else 0.0,
        })
        happy("  LADDIE t = {:.1f} d: mean melt {:.3f} m/yr, max {:.3f} m/yr",
              t_days, mean_melt, float(melt_np.max()))
    mesh_out.close()
    scal_out.close()
    happy("LADDIE standalone done in {:.1f} s -> {}",
          _time.time() - t0, str(out))
    return lst, melt
