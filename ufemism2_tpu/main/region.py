"""Model region: initialise from config, run the outer time loop.

Re-design of src/UFEMISM/main/UFEMISM_main_model.f90: the event-driven
component scheduler (each component keeps its own t_next;
advance_region_time_to_time_of_next_action, :354-435) runs on host; the
per-step device work (PC ice dynamics, thermodynamics, component models)
are jitted pure functions. Mesh building and remapping are host-side
events.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.mesh_data import build_mesh_data
from ..core.ice.state import init_ice_state
from ..core.ice.pc import make_pc_step, interpolate_ice_to_time
from ..core.ice.masks import determine_masks
from ..core.ice.subgrid import calc_grounded_fractions_bilin_TAF
from ..core.ice.scalars import calc_ice_scalars
from ..core.idealised_geometries import calc_idealised_geometry
from ..mesh import Mesh, build_mesh_from_config
from ..models.climate import make_run_climate
from ..models.ocean import make_run_ocean
from ..models.smb import make_run_smb
from ..models.bmb import make_run_bmb
from ..models.lmb import make_run_lmb
from ..models.amb import make_run_amb
from ..models.gia import make_run_gia
from ..utils.logging_utils import routine, happy, warning


_BIG = 9.9e9


@dataclass
class ModelRegion:
    C: Config
    name: str = "ANT"
    mesh: Optional[Mesh] = None
    time: float = 0.0
    output_dir: Optional[str] = None

    def __post_init__(self):
        C = self.C
        with routine("initialise_model_region"):
            if self.mesh is None:
                with routine("setup_first_mesh"):
                    self.mesh = build_mesh_from_config(C, self.name)
            self.md = build_mesh_data(self.mesh)

            # initial geometry on the mesh vertices
            choice = getattr(C, f"choice_refgeo_init_{self.name}")
            if choice == "idealised":
                Hi, Hb, Hs, SL = calc_idealised_geometry(
                    self.mesh.V[:, 0], self.mesh.V[:, 1],
                    C.choice_refgeo_init_idealised, C)
                Hi = np.where(Hi < C.refgeo_Hi_min, 0.0, Hi)
            elif choice == "read_from_file":
                from ..io.input_files import read_geometry_onto_mesh
                Hi, Hb, SL = read_geometry_onto_mesh(C, self.name, self.mesh)
            else:
                raise ValueError(f"unknown choice_refgeo_init '{choice}'")

            self.state = init_ice_state(self.md, Hi, Hb, SL, nz=C.nz,
                                        dt_init=C.dt_ice_min)
            self.time = C.start_time_of_run
            self.state = self.state.replace(
                t_Hi_prev=jnp.asarray(float(self.time)),
                t_Hi_next=jnp.asarray(float(self.time)))

            # component models
            self.run_climate = make_run_climate(C, self.md, self.name)
            self.run_ocean = make_run_ocean(C, self.md, self.name)
            self.run_smb = make_run_smb(C, self.md, self.name)
            self.run_bmb = make_run_bmb(C, self.md, self.name)
            self.run_lmb = make_run_lmb(C, self.md, self.name)
            self.run_amb = make_run_amb(C, self.md, self.name)
            self.run_gia = make_run_gia(C, self.md, self.name, self.mesh)

            # thermodynamics
            self.do_thermo = C.choice_thermo_model == "3D_heat_equation"
            if self.do_thermo:
                from ..core.ice.thermodynamics import (make_heat_solver,
                                                       make_geothermal_flux,
                                                       run_thermodynamics)
                self._heat_solver = make_heat_solver(C, self.md)
                self._geothermal = make_geothermal_flux(C, self.md)
                md, heat, geo = self.md, self._heat_solver, self._geothermal
                dt_th = C.dt_thermodynamics
                self._thermo_step = jax.jit(
                    lambda s, T_surf, SMB, BMB: run_thermodynamics(
                        C, md, s, dt_th, T_surf, SMB, BMB, heat, geo))

            # present-day reference geometry (for alter_ice_thickness
            # fixiness/limitness and nudging targets)
            pd_choice = getattr(C, f"choice_refgeo_PD_{self.name}")
            if pd_choice == "idealised":
                Hi_PD, Hb_PD, _, _ = calc_idealised_geometry(
                    self.mesh.V[:, 0], self.mesh.V[:, 1],
                    C.choice_refgeo_PD_idealised, C)
                Hi_PD = np.where(Hi_PD < C.refgeo_Hi_min, 0.0, Hi_PD)
            elif pd_choice == "read_from_file":
                from ..io.input_files import read_geometry_onto_mesh
                Hi_PD, Hb_PD, _ = read_geometry_onto_mesh(
                    C, self.name, self.mesh, which="PD")
            else:
                Hi_PD, Hb_PD = Hi * 0.0, Hb
            self.refgeo_PD = (np.asarray(Hi_PD), np.asarray(Hb_PD))

            self.pc_step = make_pc_step(C, self.md, refgeo_Hi=Hi_PD,
                                        refgeo_Hb=Hb_PD)

            # component forcing caches
            nV = self.md.nV
            self.climate = self.run_climate(self.time, self.state)
            self.ocean = self.run_ocean(self.time, self.state)
            self.SMB = self.run_smb(self.time, self.state,
                                    climate=self.climate)
            m0 = determine_masks(self.md, self.state.Hi, self.state.Hb,
                                 self.state.SL)
            fg0 = calc_grounded_fractions_bilin_TAF(
                self.md, self.state.Hi, self.state.Hb, self.state.SL,
                m0["mask_floating_ice"])
            self.BMB = self.run_bmb(self.time, self.state, m0, fg0,
                                    self.ocean)
            self.LMB = self.run_lmb(self.time, self.state, m0)
            self.AMB = self.run_amb(self.time, self.state)

            # initialise Ti
            ti_choice = getattr(C,
                                f"choice_initial_ice_temperature_{self.name}")
            if self.do_thermo and ti_choice == "Robin":
                from ..core.ice.thermodynamics import (
                    robin_solution, calc_pressure_melting_point)
                Ti_pmp = calc_pressure_melting_point(self.md,
                                                     self.state.Hi_eff)
                T_surf = self.climate["T2m"].mean(axis=1)
                Ti0 = robin_solution(C, self.md, self.state.Hi_eff, Ti_pmp,
                                     m0, T_surf, self.SMB, self._geothermal)
                self.state = self.state.replace(Ti=Ti0)
            elif ti_choice == "uniform":
                self.state = self.state.replace(
                    Ti=jnp.full_like(
                        self.state.Ti,
                        getattr(C, "uniform_initial_ice_temperature_"
                                + self.name)))

            # event scheduling (UFEMISM_main_model.f90:598-609)
            t0 = self.time
            self.t_next = {
                "climate": t0, "ocean": t0, "SMB": t0, "BMB": t0,
                "LMB": t0,
                "GIA": (t0 + C.dt_GIA) if C.choice_GIA_model != "none"
                       else _BIG,
                "thermo": (t0 + C.dt_thermodynamics) if self.do_thermo
                          else _BIG,
                "output": t0, "output_restart": t0,
            }
            self.dt_comp = {
                "climate": C.dt_climate, "ocean": C.dt_ocean,
                "SMB": C.dt_SMB, "BMB": C.dt_BMB, "LMB": C.dt_LMB,
                "GIA": C.dt_GIA, "thermo": C.dt_thermodynamics,
                "output": C.dt_output, "output_restart": C.dt_output_restart,
            }

            self.n_dt_ice = 0
            self._outputs_open = False
            self.scalars_history = []

    # -- output -------------------------------------------------------------

    def _open_outputs(self):
        if self._outputs_open or self.output_dir is None:
            return
        from ..io.output_files import MeshOutputFile, ScalarOutputFile
        out = Path(self.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        self.mesh_out = MeshOutputFile(
            out / f"main_output_{self.name}_00001.nc", self.mesh)
        self.scalar_out = ScalarOutputFile(
            out / f"scalar_output_{self.name}_00001.nc")
        self._outputs_open = True

    def write_output(self):
        s = interpolate_ice_to_time(self.state, jnp.asarray(self.time))
        masks = determine_masks(self.md, s.Hi, s.Hb, s.SL)
        fg = calc_grounded_fractions_bilin_TAF(self.md, s.Hi, s.Hb, s.SL,
                                               masks["mask_floating_ice"])
        scal = calc_ice_scalars(self.md, s.Hi, s.Hb, s.SL, fg,
                                self.SMB, self.BMB, self.LMB)
        scal.update(dt_ice=float(s.dt_ice),
                    n_visc_its=int(s.n_visc_its),
                    n_Axb_its=int(s.n_Axb_its))
        self.scalars_history.append({"time": self.time,
                                     **{k: float(v) for k, v in scal.items()}})
        if self.output_dir is not None:
            self._open_outputs()
            self.scalar_out.write(self.time, scal)
            uabs = jnp.sqrt(s.u_vav_b ** 2 + s.v_vav_b ** 2)
            self.mesh_out.write(self.time, {
                "Hi": s.Hi, "Hb": s.Hb, "Hs": s.Hs, "Hib": s.Hib,
                "SL": s.SL, "dHi_dt": s.dHi_dt,
                "u_vav_b": s.u_vav_b, "v_vav_b": s.v_vav_b,
                "uabs_vav_b": uabs, "divQ": s.divQ,
                "fraction_gr": fg, "Ti_base": s.Ti[:, -1]})

    # -- the main time loop -------------------------------------------------

    def run_to(self, t_end: float, dt_max: Optional[float] = None,
               verbose: bool = False):
        """Event-driven main loop (run_model_region, :103-190)."""
        C = self.C
        dt_max = dt_max if dt_max is not None else C.dt_ice_max
        t0_wall = _time.perf_counter()
        with routine("run_model_region"):
            while self.time < t_end - 1e-9:
                # run components whose t_next has arrived
                self._run_components()

                # ice dynamics: advance prediction window if due
                if float(self.state.t_Hi_next) <= self.time + 1e-9:
                    self.state = self.pc_step(
                        self.state,
                        jnp.asarray(min(dt_max,
                                        max(t_end - float(self.state.t_Hi_next),
                                            C.dt_ice_min))),
                        SMB=self.SMB, BMB=self.BMB, LMB=self.LMB)
                    self.n_dt_ice += 1

                # advance region time to next action
                t_candidates = [float(self.state.t_Hi_next)]
                t_candidates += [t for t in self.t_next.values()]
                self.time = min(min(t_candidates), t_end)
                if verbose and self.n_dt_ice % 200 == 0:
                    print(f"  t={self.time:12.2f} yr  "
                          f"dt={float(self.state.dt_ice):8.4f}  "
                          f"steps={self.n_dt_ice}")
        self.state = interpolate_ice_to_time(self.state,
                                             jnp.asarray(self.time))
        self.wallclock = _time.perf_counter() - t0_wall
        return self.state

    def _run_components(self):
        C = self.C
        t = self.time
        eps = 1e-9
        s = interpolate_ice_to_time(self.state, jnp.asarray(t))
        masks = fg = None

        def need(name):
            return self.t_next[name] <= t + eps

        def bump(name):
            self.t_next[name] = self.t_next[name] + self.dt_comp[name]

        if need("climate"):
            self.climate = self.run_climate(t, s)
            bump("climate")
        if need("ocean"):
            self.ocean = self.run_ocean(t, s)
            bump("ocean")
        if need("SMB"):
            self.SMB = self.run_smb(t, s, climate=self.climate)
            bump("SMB")
        if need("BMB") or need("LMB"):
            masks = determine_masks(self.md, s.Hi, s.Hb, s.SL)
            fg = calc_grounded_fractions_bilin_TAF(
                self.md, s.Hi, s.Hb, s.SL, masks["mask_floating_ice"])
        if need("BMB"):
            self.BMB = self.run_bmb(t, s, masks, fg, self.ocean)
            bump("BMB")
        if need("LMB"):
            self.LMB = self.run_lmb(t, s, masks)
            bump("LMB")
        if need("GIA") and self.C.choice_GIA_model != "none":
            dHb_dt, dHb = self.run_gia(t, s, self.dt_comp["GIA"])
            self.state = self.state.replace(
                dHb=dHb, Hb=self.state.Hb + (dHb - self.state.dHb))
            bump("GIA")
        if need("thermo") and self.do_thermo:
            T_surf = self.climate["T2m"].mean(axis=1)
            Ti_new, _ = self._thermo_step(s, T_surf, self.SMB, self.BMB)
            self.state = self.state.replace(Ti=Ti_new)
            bump("thermo")
        if need("output"):
            self.write_output()
            bump("output")
        if need("output_restart"):
            if self.output_dir is not None:
                from ..io.output_files import write_restart_file
                write_restart_file(
                    Path(self.output_dir) / f"restart_{self.name}_00001.nc",
                    self.mesh, self.state, self.time)
            bump("output_restart")
