"""Model region: initialise from config, run the outer time loop.

Re-design of src/UFEMISM/main/UFEMISM_main_model.f90: the event-driven
component scheduler (each component keeps its own t_next;
advance_region_time_to_time_of_next_action, :354-435) runs on host; the
per-step device work (PC ice dynamics, thermodynamics, component models)
are jitted pure functions. Mesh building and remapping are host-side
events.
"""

from __future__ import annotations

import os
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
from ..core.ice.pc import (make_pc_step, make_pc_multistep,
                           interpolate_ice_to_time)
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
from ..io.output_files import LINE_FIELDS as _LINE_FIELDS


_BIG = 9.9e9


@dataclass
class ModelRegion:
    C: Config
    name: str = "ANT"
    mesh: Optional[Mesh] = None
    time: float = 0.0
    output_dir: Optional[str] = None
    # initial ice-dynamics steps per dispatch; run_to measures achieved
    # steps/s and re-aims every dispatch at UF_FF_TARGET_S wall seconds
    # (default 20 s) so a slow config (MISMIP+ GL, seconds/step) cannot
    # trip the remote tunnel's liveness watchdog with a minutes-long
    # dispatch, while a fast one (Halfar, ms/step) still batches
    # thousands of steps per host round-trip
    max_ff_steps: int = 8

    def __post_init__(self):
        C = self.C
        with routine("initialise_model_region"):
            if self.mesh is None:
                with routine("setup_first_mesh"):
                    self.mesh = build_mesh_from_config(C, self.name)
            import jax.numpy as _jnp
            dtype = _jnp.float32 if C.tpu_precision == "f32" else None
            self.md = build_mesh_data(self.mesh, dtype=dtype)
            if C.refgeo_idealised_MISMIPplus_tune_A \
                    and C.choice_ice_rheology_Glen == "uniform":
                # dynamic flow-factor multiplier: the MISMIP+ tuning loop
                # (main/program.py mismipplus_adapt_flow_factor) updates
                # it in place between coupling intervals with NO re-trace
                from ..core.mesh_data import EField
                self.md.extras["glen_A_scale"] = EField(
                    _jnp.asarray(1.0, self.md.A.dtype), "scalar")

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

            if getattr(C, "choice_sealevel_model", "fixed") == "fixed":
                # the reference overrides the geometry file's SL with the
                # configured fixed value at ice-model initialisation
                # (ice_dynamics_main.f90:238) - found by the
                # reference-output parity harness (SL -10 vs -10000)
                SL = np.full_like(np.asarray(Hi, dtype=np.float64),
                                  C.fixed_sealevel)
            self.state = init_ice_state(self.md, Hi, Hb, SL, nz=C.nz,
                                        dt_init=C.dt_ice_min)
            self.time = C.start_time_of_run
            self.state = self.state.replace(
                t_Hi_prev=jnp.asarray(float(self.time)),
                t_Hi_next=jnp.asarray(float(self.time)))

            # component models
            self.run_climate = make_run_climate(C, self.md, self.name,
                                                mesh=self.mesh)
            self.run_ocean = make_run_ocean(C, self.md, self.name,
                                            mesh=self.mesh)
            self.run_smb = make_run_smb(C, self.md, self.name)
            self.run_bmb = make_run_bmb(
                C, self.md, self.name,
                target_geometry=self._bmb_target_geometry)
            self.run_lmb = make_run_lmb(C, self.md, self.name)
            self.run_amb = make_run_amb(C, self.md, self.name)
            self.run_gia = make_run_gia(C, self.md, self.name, self.mesh)

            # thermodynamics
            self.do_thermo = C.choice_thermo_model == "3D_heat_equation"
            if self.do_thermo:
                from ..core.ice.thermodynamics import (make_heat_solver,
                                                       make_geothermal_flux,
                                                       register_thermo_static,
                                                       run_thermodynamics)
                register_thermo_static(self.md)
                self._heat_solver = make_heat_solver(C, self.md)
                self._geothermal = make_geothermal_flux(C, self.md)
                heat = self._heat_solver
                dt_th = C.dt_thermodynamics
                self._thermo_step = jax.jit(
                    lambda md_, s, T_surf, SMB, BMB: run_thermodynamics(
                        C, md_, s, dt_th, T_surf, SMB, BMB, heat))
                self._thermo_step_raw = \
                    lambda md_, s, T_surf, SMB, BMB: run_thermodynamics(
                        C, md_, s, dt_th, T_surf, SMB, BMB, heat)

            # present-day reference geometry (for alter_ice_thickness
            # fixiness/limitness and nudging targets)
            pd_choice = getattr(C, f"choice_refgeo_PD_{self.name}")
            if pd_choice == "idealised":
                Hi_PD, Hb_PD, _, _ = calc_idealised_geometry(
                    self.mesh.V[:, 0], self.mesh.V[:, 1],
                    C.choice_refgeo_PD_idealised, C)
                Hi_PD = np.where(Hi_PD < C.refgeo_Hi_min, 0.0, Hi_PD)
            elif pd_choice == "read_from_file" and os.path.exists(
                    getattr(C, f"filename_refgeo_PD_{self.name}")):
                from ..io.input_files import read_geometry_onto_mesh
                Hi_PD, Hb_PD, _ = read_geometry_onto_mesh(
                    C, self.name, self.mesh, which="PD")
            else:
                # PD file absent (idealised test setups): fall back to the
                # initial geometry as the PD reference.
                Hi_PD, Hb_PD = np.asarray(Hi), np.asarray(Hb)
            self.refgeo_PD = (np.asarray(Hi_PD), np.asarray(Hb_PD))

            # bed roughness (nudgable)
            from ..models.bed_roughness import (initial_bed_roughness,
                                                make_run_bed_roughness_nudging)
            self.bed_roughness_state = initial_bed_roughness(
                C, self.md, region_name=self.name, Hb=Hb)
            self.state = self.state.replace(
                bed_roughness=self.bed_roughness_state.generic)
            self.do_nudging = C.do_bed_roughness_nudging
            if self.do_nudging:
                self._nudge_step = make_run_bed_roughness_nudging(C, self.md)

            self._bedrock_cdfs = _build_bedrock_cdfs(C, self.mesh,
                                                     self.name, self.md)
            self.pc_step = make_pc_step(C, self.md, refgeo_Hi=Hi_PD,
                                        refgeo_Hb=Hb_PD,
                                        bedrock_cdfs=self._bedrock_cdfs)
            self._thermo_fused = self.do_thermo
            # distributed mode (tpu_n_devices > 1): the ice-dynamics
            # fast-forward runs sharded over the device mesh
            # (parallel/dist.py ShardedModel); the thermodynamics event
            # is fused into the sharded stepping loop too (its static
            # sector tables distribute through the generic extras path)
            self._dist = None
            n_dev = int(getattr(C, "tpu_n_devices", 1))
            if n_dev > 1:
                import jax as _jax
                if len(_jax.devices()) >= n_dev:
                    pass          # thermo stays fused, now sharded
                else:
                    warning("tpu_n_devices={} but only {} devices visible;"
                            " running single-device", n_dev,
                            len(_jax.devices()))
                    n_dev = 1
            self._n_dev = n_dev
            self.pc_multistep = make_pc_multistep(
                C, self.pc_step,
                thermo_step=self._thermo_step if self._thermo_fused
                else None)
            self.t_thermo_next = self.time + C.dt_thermodynamics

            # component forcing caches + fused dispatch (rebuilt on every
            # mesh update - the closures capture mesh-sized arrays)
            self._build_component_dispatch()

            self.climate = self.run_climate(self.time, self.state)
            self._T_surf = self.climate["T2m"].mean(axis=1)
            self.ocean = self.run_ocean(self.time, self.state)
            self.SMB = self.run_smb(self.time, self.state,
                                    climate=self.climate)
            m0, fg0 = self._masks_fracs(self.md, self.state.Hi,
                                        self.state.Hb, self.state.SL)
            self.BMB = self.run_bmb(self.time, self.state, m0, fg0,
                                    self.ocean)
            self.LMB = self.run_lmb(self.time, self.state, m0)
            self.AMB = self.run_amb(self.time, self.state)

            # target thinning rates from file (inversion spinups;
            # initialise_dHi_dt_target, inversion_utilities.f90:32-90 +
            # the SMB limit of UFEMISM_main_model.f90:1541-1547)
            if getattr(C, "do_target_dHi_dt", False):
                fname = getattr(C, f"filename_dHi_dt_target_{self.name}", "")
                if fname and os.path.exists(fname):
                    from ..io.input_files import read_field_from_file_2D
                    tf = getattr(C, f"timeframe_dHi_dt_target_{self.name}",
                                 1e9)
                    tgt = jnp.asarray(read_field_from_file_2D(
                        fname, "dHdt", self.mesh,
                        time_to_read=None if tf == 1e9 else tf),
                        self.state.Hi.dtype)
                    if C.do_limit_target_dHi_dt_to_SMB:
                        tgt = jnp.where(
                            tgt > 0.0,
                            jnp.maximum(0.0, jnp.minimum(tgt, self.SMB)),
                            tgt)
                    self.state = self.state.replace(dHi_dt_target=tgt)

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
                self.state = self.state.replace(
                    Ti=Ti0.astype(self.state.Ti.dtype))
            elif ti_choice == "uniform":
                self.state = self.state.replace(
                    Ti=jnp.full_like(
                        self.state.Ti,
                        getattr(C, "uniform_initial_ice_temperature_"
                                + self.name)))

            # initial stress-balance solve so the t=0 state (and output
            # frame) carries real velocities - the reference solves at
            # ice-dynamics initialisation (ice_dynamics_main.f90:1412 +
            # initialise_velocity_solver:389); found by the parity
            # harness (our first output frame had u == 0, halving the
            # reference checksum's |u| integrals)
            if getattr(C, f"choice_initial_velocity_{self.name}",
                       "zero") == "zero" \
                    and C.choice_stress_balance_approximation != "none" \
                    and not os.environ.get("UF_NO_INIT_SOLVE"):
                from ..core.ice.pc import make_solve_stress_balance
                _solve0 = jax.jit(make_solve_stress_balance(
                    C, self.md, bedrock_cdfs=self._bedrock_cdfs))
                s0 = self.state
                uv0, vv0, u30, v30, _, _, aux0 = _solve0(
                    self.md, s0.Hi, s0.Hs, s0.Hb, s0.SL, s0.Ti, s0)
                # materialise NOW: a device fault in this one-off program
                # must surface here, attributable, not at the first
                # output event's device_get minutes later
                jax.block_until_ready(uv0)
                self.state = s0.replace(
                    u_vav_b=uv0, v_vav_b=vv0, u_3D_b=u30, v_3D_b=v30,
                    **aux0)

            # event scheduling (UFEMISM_main_model.f90:598-609)
            t0 = self.time
            self.t_next = {
                "climate": t0, "ocean": t0, "SMB": t0, "BMB": t0,
                "LMB": t0,
                "GIA": (t0 + C.dt_GIA) if C.choice_GIA_model != "none"
                       else _BIG,
                "thermo": (t0 + C.dt_thermodynamics)
                if (self.do_thermo and not self._thermo_fused)
                          else _BIG,
                "bed_roughness": (t0 + C.bed_roughness_nudging_dt)
                                 if C.do_bed_roughness_nudging else _BIG,
                "basal_hydro": t0
                if C.choice_basal_hydrology_model == "Salle2025" else _BIG,
                "tracers": (t0 + C.tractrackpart_dt_coupling)
                if C.choice_tracer_tracking_model == "particles" else _BIG,
                "output": t0, "output_restart": t0,
                # checksum oracle fires on its own deterministic event
                # cadence: host-loop iterations are wall-clock-chunk
                # dependent (adaptive dispatch sizing), so logging per
                # iteration gave irreproducible logs between identical
                # runs - event times are trajectory-determined only
                "checksum": t0 if C.do_write_checksum_log else _BIG,
            }
            self.dt_comp = {
                "climate": C.dt_climate, "ocean": C.dt_ocean,
                "SMB": C.dt_SMB, "BMB": C.dt_BMB, "LMB": C.dt_LMB,
                "GIA": C.dt_GIA, "thermo": C.dt_thermodynamics,
                "bed_roughness": C.bed_roughness_nudging_dt,
                "basal_hydro": C.dt_basal_hydro,
                "tracers": C.tractrackpart_dt_coupling,
                "output": C.dt_output, "output_restart": C.dt_output_restart,
                "checksum": min(C.dt_SMB, C.dt_BMB),
            }

            # Lagrangian tracer tracking (tracer_tracking_main.f90)
            if C.choice_tracer_tracking_model == "particles":
                from ..models.tracers import (PointLocator,
                                              make_tracer_stepper)
                loc = PointLocator(self.mesh)
                (self._tracer_init, self._tracer_step,
                 self._tracer_spawn, self._tracer_to_mesh) = \
                    make_tracer_stepper(C, self.md, loc)
                self.tracer_state = self._tracer_init(self.state, t0)
                self._tracer_key = jax.random.PRNGKey(7)

            # Salle2025 transient hydrology state + its extras slot
            if C.choice_basal_hydrology_model == "Salle2025":
                from ..core.ice.hydrology_salle2025 import \
                    init_salle2025_state
                from ..core.mesh_data import EField
                from ..utils.constants import ice_density as _rho_i, \
                    grav as _g
                self.hydro_state = init_salle2025_state(self.md)
                self.md.extras["hydro_N_eff"] = EField(
                    _rho_i * _g * self.state.Hi, "V")

            self.n_dt_ice = 0
            self._outputs_open = False
            self.scalars_history = []

            # checksum parity oracle (checksum_mod.f90; call points mirror
            # ice_dynamics_main.f90:153-162)
            from ..utils.checksum import ChecksumLogger
            self.checksum = ChecksumLogger(
                path=(Path(self.output_dir)
                      / f"checksum_log_{self.name}.jsonl")
                if (self.output_dir and C.do_write_checksum_log) else None,
                enabled=C.do_write_checksum_log)

            # pc-controller warm start from a restart file
            # (predictor_corrector_scheme.f90:417-444 'read_from_file')
            if getattr(C, f"pc_choice_initialise_{self.name}") \
                    == "read_from_file":
                from ..io.output_files import restore_state_from_restart
                fname = getattr(C, f"filename_pc_initialise_{self.name}")
                _, st = restore_state_from_restart(self.state, fname)
                self.state = self.state.replace(pc=st.pc)

            # distributed mode: shard the stepping loop over the device
            # mesh (built last - needs the initialised state for specs)
            if self._n_dev > 1:
                from ..parallel.dist import ShardedModel
                with routine("build_sharded_model"):
                    self._dist = ShardedModel(C, self, self._n_dev)

    def _build_component_dispatch(self):
        """(Re)build the jitted mask/fraction cache and the fused
        per-event component update: when every 'cheap' component is due
        at the same event time (the common case - they share dt
        cadences), ONE jitted dispatch computes climate/ocean/SMB/masks/
        BMB/LMB instead of ~6 host round-trips (each costs tens of ms
        through the remote dispatch tunnel). Gated to jit-pure component
        choices; laddie/inverted/file-driven models use the
        per-component path. Must be called again after a mesh update
        (the closures capture mesh-sized arrays)."""
        C = self.C

        @jax.jit
        def _masks_fracs(md_, Hi, Hb, SL):
            m = determine_masks(md_, Hi, Hb, SL)
            fg = calc_grounded_fractions_bilin_TAF(
                md_, Hi, Hb, SL, m["mask_floating_ice"])
            return m, fg
        self._masks_fracs = _masks_fracs

        _pure_bmb = getattr(C, f"choice_BMB_model_{self.name}") in (
            "uniform", "idealised", "parameterised")
        _pure_smb = getattr(C, f"choice_SMB_model_{self.name}") in (
            "uniform", "idealised", "prescribed")
        # matrix climate and IMAU-ITM SMB carry host-held state
        # (albedo/firn history) and run on the per-component path
        _pure_climate = getattr(
            C, f"choice_climate_model_{self.name}") != "matrix"
        # nudge2D carries host-held deltaT state -> per-component path
        _pure_ocean = getattr(
            C, f"choice_ocean_model_{self.name}") != "snapshot+nudge2D"
        self._can_fuse_components = _pure_bmb and _pure_smb \
            and _pure_climate and _pure_ocean \
            and not C.do_bed_roughness_nudging

        if self._can_fuse_components:
            run_climate, run_ocean, run_smb = (self.run_climate,
                                               self.run_ocean,
                                               self.run_smb)
            run_bmb, run_lmb = self.run_bmb, self.run_lmb
            run_amb = self.run_amb

            @jax.jit
            def _components_all(md_, state, t):
                s = interpolate_ice_to_time(state, t)
                climate = run_climate(t, s)
                T_surf = climate["T2m"].mean(axis=1)
                ocean = run_ocean(t, s)
                SMB = run_smb(t, s, climate=climate)
                m = determine_masks(md_, s.Hi, s.Hb, s.SL)
                fg = calc_grounded_fractions_bilin_TAF(
                    md_, s.Hi, s.Hb, s.SL, m["mask_floating_ice"])
                BMB = run_bmb(t, s, m, fg, ocean)
                LMB = run_lmb(t, s, m)
                AMB = run_amb(t, s)
                return climate, T_surf, ocean, SMB, BMB, LMB, AMB
            self._components_all = _components_all

    def _log_checksums(self):
        """Checksum the hot ice fields at checksum-event times (the
        reference's call points, ice_dynamics_main.f90:153-162; our
        cadence is the fastest coupling interval). Event times are
        trajectory-determined, and the step sequence is independent of
        the adaptive dispatch chunking, so identical runs produce
        bitwise-identical logs. The prognostic thickness lives in
        (Hi_prev, Hi_next); s.Hi is only refreshed at output events, so
        interpolate to the current model time first or the logged
        geometry is stale."""
        import jax
        from ..core.ice.pc import interpolate_ice_to_time
        s = interpolate_ice_to_time(self.state, self.time)
        names = ("Hi", "Hs", "Hib", "TAF", "dHi_dt",
                 "u_vav_b", "v_vav_b", "Ti")
        vals = jax.device_get([getattr(s, n) for n in names])
        for n, v in zip(names, vals):
            self.checksum.log(f"ice.{n}", v, t=self.time)

    def set_sealevel(self, sealevel: float):
        """Apply a (possibly time-varying) global sea level to the region
        (update_sealevel_at_model_time; derived geometry and masks are
        recomputed from SL in the next ice-dynamics step)."""
        self.state = self.state.replace(
            SL=jnp.full_like(self.state.SL, sealevel))
        return self

    def _bmb_target_geometry(self):
        """Target (Hi, shelf mask) for the inverted-BMB model from the
        PD reference geometry (BMB_inverted.f90:70-96). Late-bound:
        gates overwrite self.refgeo_PD with a spun-up/retreated state
        before the inversion leg."""
        from ..core.ice.geometry import thickness_above_flotation
        Hi_t, Hb_t = self.refgeo_PD
        Hi_t = jnp.asarray(Hi_t, self.md.A.dtype)
        Hb_t = jnp.asarray(Hb_t, self.md.A.dtype)
        taf = thickness_above_flotation(Hi_t, Hb_t, jnp.zeros_like(Hi_t))
        shelf = (taf <= 0.0) & (Hi_t > 0.1)
        return Hi_t, shelf

    def write_restart(self):
        """Force a restart write at the current model time (used by gate
        runners at leg boundaries so a completed leg resumes as
        completed instead of re-running)."""
        if self.output_dir is not None:
            from ..io.output_files import write_restart_file
            write_restart_file(
                Path(self.output_dir) / f"restart_{self.name}_00001.nc",
                self.mesh, self.state, self.time,
                host_counters={"n_dt_ice": int(self.n_dt_ice)})

    def resume_from_restart(self, path):
        """Restore the full model state (incl. pc controller) and model
        time from a restart file written by this run or an earlier one on
        the same mesh; component events re-fire at the resumed time."""
        from ..io.output_files import (restore_state_from_restart,
                                       load_restart_host_counters)
        time, state = restore_state_from_restart(self.state, path)
        self.state = state
        self.time = time
        # cumulative host-side stability counters survive the resume
        # (the reference persists pc state + counters,
        # predictor_corrector_scheme.f90:510-620); restarts written
        # before the scheme carry none -> keep the fresh counter.
        self.n_dt_ice = int(load_restart_host_counters(path).get(
            "n_dt_ice", self.n_dt_ice))
        for k in self.t_next:
            # re-fire only the events active in this configuration
            # (inactive ones are parked at _BIG and must stay there)
            if self.t_next[k] < _BIG:
                self.t_next[k] = time
        if self.do_thermo:
            self.t_thermo_next = time + self.C.dt_thermodynamics
        # refresh component forcings at the resumed time
        m0, fg0 = self._masks_fracs(self.md, self.state.Hi, self.state.Hb,
                                    self.state.SL)
        self.climate = self.run_climate(time, self.state)
        self._T_surf = self.climate["T2m"].mean(axis=1)
        self.ocean = self.run_ocean(time, self.state)
        self.SMB = self.run_smb(time, self.state, climate=self.climate)
        self.BMB = self.run_bmb(time, self.state, m0, fg0, self.ocean)
        self.LMB = self.run_lmb(time, self.state, m0)
        self.AMB = self.run_amb(time, self.state)
        return self

    # -- output -------------------------------------------------------------

    # choice_output_field_* names the writers can currently resolve from
    # the model state (main_regional_output.f90's menu; the rest warn)
    _EXTRA_OUTPUT_SUPPORTED = {
        "u_3D", "v_3D", "w_3D", "u_vav", "v_vav", "uabs_vav",
        "u_base", "v_base", "uabs_base",
        "dHi", "Hs_b", "dHs_dx", "dHs_dy",
        "SMB", "BMB", "LMB", "mask",
        "mask_gl_gr", "mask_gl_fl", "mask_cf_gr", "mask_cf_fl",
        "fraction_gr_b", "bed_roughness", "till_friction_angle",
        "pore_water_fraction", "basal_friction_coefficient",
        "TAF", "R_shear", "pc_truncation_error",
        # polyline fields, extracted host-side at output cadence
        # (mesh_output_files.f90 write_grounding_line_to_file ff.)
        "grounding_line", "ice_margin", "calving_front", "coastline",
        "grounded_ice_contour",
    }

    def _requested_output_fields(self):
        """Extra output variables from choice_output_field_01..50
        (model_configuration: every selected name becomes a variable in
        the main mesh + grid output files)."""
        from ..io.output_files import MESH_FIELDS_DEFAULT
        req, unsupported = [], []
        for i in range(1, 51):
            v = getattr(self.C, f"choice_output_field_{i:02d}", "none")
            if not v or v == "none" or v in req \
                    or v in MESH_FIELDS_DEFAULT:
                continue
            if v in self._EXTRA_OUTPUT_SUPPORTED:
                req.append(v)
            else:
                unsupported.append(v)
        if unsupported:
            warning("choice_output_field: not yet writable, skipping {}",
                    unsupported)
        return req

    def _open_outputs(self):
        if self._outputs_open or self.output_dir is None:
            return
        from ..io.output_files import MeshOutputFile, ScalarOutputFile
        out = Path(self.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        if not hasattr(self, "_out_gen"):
            # mesh output files are numbered per mesh generation
            # (reference: a new main_output_<R>_0000N.nc per mesh
            # update, main_regional_output.f90). A fresh process
            # resuming into an output dir with existing generations
            # starts the next one so prior frames survive the resume.
            existing = [p for p in out.glob(f"main_output_{self.name}_0*.nc")
                        if "_grid" not in p.name]
            self._out_gen = len(existing) + 1
        from ..io.output_files import MESH_FIELDS_DEFAULT
        self._extra_out_fields = self._requested_output_fields()
        out_fields = MESH_FIELDS_DEFAULT + self._extra_out_fields
        self.mesh_out = MeshOutputFile(
            out / f"main_output_{self.name}_{self._out_gen:05d}.nc",
            self.mesh, fields=out_fields)
        self.scalar_out = ScalarOutputFile(
            out / f"scalar_output_{self.name}_00001.nc")
        # gridded main output (grid_output_files.f90; created for every
        # region like the reference, UFEMISM_main_model.f90:664)
        from ..io.output_files import GridOutputFile
        from ..mesh.grids import setup_square_grid
        g = setup_square_grid(self.mesh.xmin, self.mesh.xmax,
                              self.mesh.ymin, self.mesh.ymax,
                              getattr(self.C, f"dx_output_grid_{self.name}"))
        self.grid_out = GridOutputFile(
            out / f"main_output_{self.name}_grid.nc", self.mesh, g,
            fields=out_fields)
        # transect output files (transects_main.f90)
        self.transect_out = []
        tr_str = getattr(self.C, f"transects_{self.name}", "")
        if tr_str:
            from ..models.transects import Transect, TransectOutputFile
            for spec in tr_str.split("||"):
                spec = spec.strip()
                if not spec:
                    continue
                tr = Transect.from_config_str(self.mesh, spec)
                self.transect_out.append(TransectOutputFile(
                    out / f"transect_{tr.name}.nc", tr))
        # per-ROI scalar files (scalar_output_files_ROI.f90)
        self.roi_scalar_out = {}
        self._roi_masks = {}
        rois = [r.strip() for r in
                self.C.choice_regions_of_interest.split(",") if r.strip()]
        if rois:
            from matplotlib.path import Path as MplPath
            from ..mesh.roi_polygons import calc_roi_polygon
            for roi in rois:
                poly = calc_roi_polygon(roi)
                m = MplPath(poly).contains_points(self.mesh.V)
                self._roi_masks[roi] = jnp.asarray(m)
                self.roi_scalar_out[roi] = ScalarOutputFile(
                    out / f"scalar_output_{self.name}_{roi}_00001.nc")
        # ISMIP-standard gridded output (ismip_grid_output_files.f90)
        self.ismip_out = None
        if self.C.do_create_ismip_output:
            from ..io.ismip_output import ISMIPOutput
            from ..mesh.grids import setup_square_grid
            from ..remap.atlas import get_map
            dx = getattr(self.C, f"dx_output_grid_{self.name}")
            grid = setup_square_grid(self.mesh.xmin, self.mesh.xmax,
                                     self.mesh.ymin, self.mesh.ymax, dx)
            M = get_map(self.mesh, grid)
            self._ismip_grid = grid
            self._ismip_map = lambda f: (M @ np.asarray(f)).reshape(
                grid.nx, grid.ny).T      # [ny, nx]
            self.ismip_out = ISMIPOutput(
                out / f"main_output_{self.name}_grid_ISMIP.nc", grid)
        self._outputs_open = True

    def _rotate_outputs_for_new_mesh(self):
        """Mesh update while outputs are open: rotate the mesh output
        file to the next generation (the reference creates a fresh
        main_output_<R>_0000N.nc per mesh, main_regional_output.f90)
        and rebuild the mesh->target maps of the mesh-independent
        files (gridded / transect / ISMIP / ROI masks), which stay
        open and keep their history. Closing before reopening matters:
        h5py refuses to truncate a path that still has a live handle."""
        if not self._outputs_open:
            return
        from ..io.output_files import MeshOutputFile, MESH_FIELDS_DEFAULT
        out = Path(self.output_dir)
        self.mesh_out.close()
        self._out_gen += 1
        self.mesh_out = MeshOutputFile(
            out / f"main_output_{self.name}_{self._out_gen:05d}.nc",
            self.mesh,
            fields=MESH_FIELDS_DEFAULT
            + getattr(self, "_extra_out_fields", []))
        if getattr(self, "grid_out", None) is not None:
            self.grid_out.update_mesh(self.mesh)
        if getattr(self, "transect_out", []):
            from ..models.transects import Transect
            for tout in self.transect_out:
                tout.tr = Transect(self.mesh, tout.tr.points, tout.tr.name)
        if self.roi_scalar_out:
            from matplotlib.path import Path as MplPath
            from ..mesh.roi_polygons import calc_roi_polygon
            for roi in list(self._roi_masks):
                poly = calc_roi_polygon(roi)
                self._roi_masks[roi] = jnp.asarray(
                    MplPath(poly).contains_points(self.mesh.V))
        if self.ismip_out is not None:
            from ..remap.atlas import get_map
            grid = self._ismip_grid
            M = get_map(self.mesh, grid)
            self._ismip_map = lambda f: (M @ np.asarray(f)).reshape(
                grid.nx, grid.ny).T

    def write_output(self):
        if not hasattr(self, "_output_calc"):
            extra = self._extra_out_fields = \
                self._requested_output_fields()
            C = self.C

            @jax.jit
            def _output_calc(md_, state, t, SMB, BMB, LMB):
                s = interpolate_ice_to_time(state, t)
                m = determine_masks(md_, s.Hi, s.Hb, s.SL)
                fg = calc_grounded_fractions_bilin_TAF(
                    md_, s.Hi, s.Hb, s.SL, m["mask_floating_ice"])
                scal = calc_ice_scalars(md_, s.Hi, s.Hb, s.SL, fg,
                                        SMB, BMB, LMB, masks=m,
                                        fraction_margin=s.fraction_margin,
                                        u_vav_b=s.u_vav_b,
                                        v_vav_b=s.v_vav_b,
                                        dHi_dt=s.dHi_dt,
                                        dHi_dt_target=s.dHi_dt_target)
                # surface velocities stay on triangles, like the
                # reference (B_GRID_FIELDS routes them to the ti dim)
                u_sf = s.u_3D_b[:, 0]
                v_sf = s.v_3D_b[:, 0]
                fields = {
                    "Hi": s.Hi, "Hb": s.Hb, "Hs": s.Hs, "Hib": s.Hib,
                    "SL": s.SL, "dHi_dt": s.dHi_dt,
                    "u_vav_b": s.u_vav_b, "v_vav_b": s.v_vav_b,
                    "uabs_vav_b": jnp.sqrt(s.u_vav_b ** 2 + s.v_vav_b ** 2),
                    "divQ": s.divQ, "fraction_gr": fg,
                    "Ti_base": s.Ti[:, -1],
                    "u_surf": u_sf, "v_surf": v_sf,
                    "uabs_surf": jnp.sqrt(u_sf ** 2 + v_sf ** 2)}
                # choice_output_field_* extras (resolved on demand)
                if "u_3D" in extra:
                    fields["u_3D"] = s.u_3D_b
                if "v_3D" in extra:
                    fields["v_3D"] = s.v_3D_b
                if "w_3D" in extra:
                    from ..core.ice.thermodynamics import (
                        calc_zeta_gradients, calc_vertical_velocities)
                    dzx, dzy, dzz, _dzt = calc_zeta_gradients(
                        md_, s.Hi, s.Hs, s.dHi_dt, s.dHi_dt)
                    u3a = md_.M_map_b_a @ s.u_3D_b
                    v3a = md_.M_map_b_a @ s.v_3D_b
                    fields["w_3D"] = calc_vertical_velocities(
                        C, md_, m, s.Hi, s.Hib, s.dHi_dt,
                        jnp.zeros_like(s.Hi), s.u_3D_b, s.v_3D_b,
                        u3a, v3a, dzx, dzy, dzz, BMB)
                if "u_vav" in extra:
                    fields["u_vav"] = s.u_vav_b
                if "v_vav" in extra:
                    fields["v_vav"] = s.v_vav_b
                if "uabs_vav" in extra:
                    fields["uabs_vav"] = jnp.sqrt(s.u_vav_b ** 2
                                                  + s.v_vav_b ** 2)
                if "u_base" in extra or "v_base" in extra \
                        or "uabs_base" in extra:
                    ub, vb = s.u_3D_b[:, -1], s.v_3D_b[:, -1]
                    fields.update(u_base=ub, v_base=vb,
                                  uabs_base=jnp.sqrt(ub ** 2 + vb ** 2))
                if "dHi" in extra:
                    fields["dHi"] = s.Hi - md_.x("refgeo_Hi")
                if "Hs_b" in extra:
                    fields["Hs_b"] = md_.M_map_a_b @ s.Hs
                if "dHs_dx" in extra:
                    fields["dHs_dx"] = md_.M_ddx_a_a.exact_matvec(s.Hs)
                if "dHs_dy" in extra:
                    fields["dHs_dy"] = md_.M_ddy_a_a.exact_matvec(s.Hs)
                if "SMB" in extra:
                    fields["SMB"] = SMB
                if "BMB" in extra:
                    fields["BMB"] = BMB
                if "LMB" in extra:
                    fields["LMB"] = LMB
                if "mask" in extra:
                    fields["mask"] = s.mask.astype(s.Hi.dtype)
                for mk in ("mask_gl_gr", "mask_gl_fl",
                           "mask_cf_gr", "mask_cf_fl"):
                    if mk in extra:
                        fields[mk] = m[mk].astype(s.Hi.dtype)
                if "fraction_gr_b" in extra:
                    fields["fraction_gr_b"] = s.fraction_gr_b
                if "bed_roughness" in extra or \
                        "till_friction_angle" in extra:
                    fields["bed_roughness"] = s.bed_roughness
                    fields["till_friction_angle"] = s.bed_roughness
                if "pore_water_fraction" in extra:
                    from ..core.ice.hydrology import \
                        calc_pore_water_fraction_martin2011
                    fields["pore_water_fraction"] = \
                        calc_pore_water_fraction_martin2011(C, s.Hb, s.SL)
                if "basal_friction_coefficient" in extra:
                    from ..core.ice.sliding import \
                        calc_basal_friction_coefficient
                    from ..core.ice.ssadiva import _bed_roughness_fields
                    from ..core.ice.subgrid import calc_effective_thickness
                    Hi_eff_o, _fm = calc_effective_thickness(
                        md_, s.Hi, s.Hb, s.SL)
                    u_base_a = md_.M_map_b_a @ s.u_3D_b[:, -1]
                    v_base_a = md_.M_map_b_a @ s.v_3D_b[:, -1]
                    slope = jnp.sqrt(
                        md_.M_ddx_a_a.exact_matvec(s.Hs) ** 2
                        + md_.M_ddy_a_a.exact_matvec(s.Hs) ** 2)
                    fields["basal_friction_coefficient"] = \
                        calc_basal_friction_coefficient(
                            C, md_, _bed_roughness_fields(
                                C, md_, s.bed_roughness),
                            u_base_a, v_base_a, s.Hi, Hi_eff_o, s.Hb,
                            s.SL, slope, fg, m)
                if "TAF" in extra or any(
                        f in _LINE_FIELDS for f in extra):
                    from ..core.ice.geometry import \
                        thickness_above_flotation
                    fields["TAF"] = thickness_above_flotation(
                        s.Hi, s.Hb, s.SL)
                    fields["mask_grounded_ice"] = \
                        m["mask_grounded_ice"].astype(s.Hi.dtype)
                if "pc_truncation_error" in extra:
                    # mesh_output_files.f90:495: region%ice%pc%tau_np1
                    fields["pc_truncation_error"] = s.pc.tau_np1
                if "R_shear" in extra:
                    # slide/shear ratio, conservation_of_momentum_main
                    # .f90:240: (|u_base| + 0.1) / (|u_surf| + 0.1)
                    ub = md_.M_map_b_a @ s.u_3D_b[:, -1]
                    vb = md_.M_map_b_a @ s.v_3D_b[:, -1]
                    us = md_.M_map_b_a @ s.u_3D_b[:, 0]
                    vs = md_.M_map_b_a @ s.v_3D_b[:, 0]
                    fields["R_shear"] = \
                        (jnp.sqrt(ub ** 2 + vb ** 2) + 0.1) \
                        / (jnp.sqrt(us ** 2 + vs ** 2) + 0.1)
                counters = (s.dt_ice, s.n_visc_its, s.n_Axb_its)
                return fields, scal, counters
            self._output_calc = _output_calc
        fields, scal, counters = self._output_calc(
            self.md, self.state, jnp.asarray(self.time),
            self.SMB, self.BMB, self.LMB)
        # ONE host transfer for everything (per-field np.asarray costs a
        # device round-trip each through the remote-dispatch tunnel)
        fields, scal, counters = jax.device_get((fields, scal, counters))
        line_req = [f for f in getattr(self, "_extra_out_fields", [])
                    if f in _LINE_FIELDS]
        if line_req:
            from ..mesh.contour import calc_mesh_contour, \
                line_output_fields
            for name in line_req:
                dmask, level = line_output_fields(
                    name, fields["Hi"], fields["Hb"], fields["SL"],
                    fields["TAF"], fields["mask_grounded_ice"] > 0.5)
                fields[name] = calc_mesh_contour(self.mesh, dmask, level)
        scal = dict(scal)
        scal.update(dt_ice=float(counters[0]),
                    n_visc_its=int(counters[1]),
                    n_Axb_its=int(counters[2]))
        self.scalars_history.append({"time": self.time,
                                     **{k: float(v) for k, v in scal.items()}})
        if self.output_dir is not None:
            self._open_outputs()
            self.scalar_out.write(self.time, scal)
            self.mesh_out.write(self.time, fields)
            if self.roi_scalar_out:
                if not hasattr(self, "_roi_scal_calc"):
                    @jax.jit
                    def _roi_scal_calc(md_, state, t, SMB, BMB, LMB, mask):
                        s = interpolate_ice_to_time(state, t)
                        return calc_ice_scalars(
                            md_, s.Hi, s.Hb, s.SL, None, SMB, BMB, LMB,
                            roi_mask=mask)
                    self._roi_scal_calc = _roi_scal_calc
                for roi, mask in self._roi_masks.items():
                    rs = jax.device_get(self._roi_scal_calc(
                        self.md, self.state, jnp.asarray(self.time),
                        self.SMB, self.BMB, self.LMB, mask))
                    self.roi_scalar_out[roi].write(
                        self.time, {k: float(v) for k, v in rs.items()})
            if getattr(self, "grid_out", None) is not None:
                self.grid_out.write(self.time, fields)
            if getattr(self, "transect_out", []):
                s_now = self._interp_j(self.state, jnp.asarray(self.time))
                for tout in self.transect_out:
                    tout.write(self.time, s_now)
            if self.ismip_out is not None:
                from ..io.ismip_output import ismip_fields_from_state
                s_now = self._interp_j(self.state, jnp.asarray(self.time))
                m_now, fg_now = self._masks_fracs(self.md, s_now.Hi,
                                                  s_now.Hb, s_now.SL)
                ifields = ismip_fields_from_state(
                    self.md, self._ismip_grid, self._ismip_map, s_now,
                    jax.device_get(m_now), fg_now, self.SMB, self.BMB)
                self.ismip_out.write(self.time, ifields)

    # -- the main time loop -------------------------------------------------

    def run_to(self, t_end: float, dt_max: Optional[float] = None,
               verbose: bool = False):
        """Event-driven main loop (run_model_region, :103-190)."""
        C = self.C
        dt_max = dt_max if dt_max is not None else C.dt_ice_max
        t0_wall = _time.perf_counter()
        if not hasattr(self, "t_last_mesh_update"):
            self.t_last_mesh_update = self.time
        with routine("run_model_region"):
            while self.time < t_end - 1e-9:
                # adaptive mesh update check (UFEMISM_main_model.f90:103-118)
                if (C.allow_mesh_updates
                        and self.time - self.t_last_mesh_update
                        >= C.dt_mesh_update_min):
                    fit = calc_mesh_fitness_coefficient(C, self.mesh,
                                                        self.state)
                    if fit < C.minimum_mesh_fitness_coefficient:
                        happy("mesh fitness {:.3f} < {:.3f}: updating mesh",
                              fit, C.minimum_mesh_fitness_coefficient)
                        self.update_mesh()
                    self.t_last_mesh_update = self.time

                # run components whose t_next has arrived
                self._run_components()

                # ice dynamics: advance prediction window if due.
                # Fast-forward on-device until the next event boundary -
                # one dispatch instead of one per ice step.
                if float(self.state.t_Hi_next) <= self.time + 1e-9:
                    t_stop = min([t_end] + list(self.t_next.values()))
                    if C.allow_mesh_updates:
                        t_stop = min(t_stop, self.t_last_mesh_update
                                     + C.dt_mesh_update_min)
                    t_hi = float(self.state.t_Hi_next)
                    # adaptive dispatch chunking: target a fixed wall
                    # time per dispatch (UF_FF_TARGET_S, default 20 s).
                    # Minutes-long dispatches reliably trip the remote
                    # tunnel's liveness watchdog ('TPU worker crashed'),
                    # and per-step cost varies by orders of magnitude
                    # between configs (Halfar ms vs MISMIP+ GL seconds),
                    # so a fixed step count cannot be right; measure the
                    # achieved steps/s and re-aim every dispatch.
                    # IMPORTANT for determinism: the chunk bound is a
                    # STEP COUNT (n_max) only - t_stop stays at the real
                    # event boundary, so the dt controller never sees an
                    # artificial (machine-speed-dependent) window edge
                    # and the trajectory is identical for any chunking.
                    if not hasattr(self, "_ff_steps"):
                        # First dispatch is ALWAYS a single step: cold
                        # steps can cost ~70 s (viscosity cold start),
                        # and 8 of them in one dispatch (~9 min with no
                        # host contact) reliably trips the tunnel's
                        # liveness watchdog and kills the remote worker
                        # (bisected 2026-08-18: n_max=1 runs, n_max=8
                        # faults on the MISMIP+ 5 km spinup). The
                        # measured-rate ramp below grows the chunk as
                        # soon as steps prove cheap.
                        self._ff_steps = 1
                        self._ff_target_s = float(os.environ.get(
                            "UF_FF_TARGET_S", "20"))
                    n_chunk = self._ff_steps
                    if t_stop > t_hi + 1e-9:
                        _tw = _time.perf_counter()
                        if self._dist is not None:
                            # sharded fast-forward over the device mesh;
                            # state converts at the window boundaries
                            # (component events run full-mesh); the
                            # thermo event advances fused + sharded
                            sd = self._dist.to_dist(self.state)
                            sd, n, t_th = self._dist.multistep(
                                sd, t_stop, dt_max,
                                SMB=self._dist.pad_field_V(self.SMB),
                                BMB=self._dist.pad_field_V(self.BMB),
                                LMB=self._dist.pad_field_V(self.LMB),
                                T_surf=self._dist.pad_field_V(self._T_surf)
                                if self._thermo_fused else None,
                                t_th=self.t_thermo_next,
                                n_max=n_chunk)
                            self.state = self._dist.from_dist(sd)
                            if self._thermo_fused:
                                self.t_thermo_next = float(t_th)
                        elif self._thermo_fused:
                            self.state, n, t_th = self.pc_multistep(
                                self.md, self.state, jnp.asarray(t_stop),
                                jnp.asarray(dt_max),
                                self.SMB, self.BMB, self.LMB,
                                self._T_surf,
                                jnp.asarray(self.t_thermo_next),
                                jnp.int32(n_chunk))
                            self.t_thermo_next = float(t_th)
                        else:
                            self.state, n = self.pc_multistep(
                                self.md, self.state, jnp.asarray(t_stop),
                                jnp.asarray(dt_max),
                                self.SMB, self.BMB, self.LMB,
                                jnp.int32(n_chunk))
                        n_int = int(n)          # device sync: dispatch done
                        wall = _time.perf_counter() - _tw
                        self.n_dt_ice += n_int
                        if n_int > 0 and wall > 0.0:
                            rate = wall / n_int
                            # grow at most 4x per dispatch: per-step cost
                            # can spike (forcing change -> visc restart),
                            # and one dispatch must stay under the
                            # tunnel's ~2 min liveness watchdog
                            self._ff_steps = int(max(1, min(
                                self._ff_target_s / max(rate, 1e-5),
                                4 * self._ff_steps, 4000)))
                    else:
                        # overshoot semantics: no window-end clamp (the
                        # reference passes dt_max = C%dt_ice_max and
                        # interpolates Hi inside the prediction window)
                        self.state = self.pc_step(
                            self.md, self.state, jnp.asarray(dt_max),
                            SMB=self.SMB, BMB=self.BMB, LMB=self.LMB)
                        self.n_dt_ice += 1

                if C.do_check_for_NaN:
                    # reference do_check_for_NaN: scan every state field
                    # and crash naming the offenders (utils/sanitizer.py)
                    from ..utils.sanitizer import check_state_for_nan
                    check_state_for_nan(self.state,
                                        where=f"t={self.time:.3f}")

                # advance region time to next action
                t_candidates = [float(self.state.t_Hi_next)]
                t_candidates += [t for t in self.t_next.values()]
                self.time = min(min(t_candidates), t_end)
                if verbose and self.n_dt_ice % 200 == 0:
                    print(f"  t={self.time:12.2f} yr  "
                          f"dt={float(self.state.dt_ice):8.4f}  "
                          f"steps={self.n_dt_ice}")
        if not hasattr(self, "_interp_j"):
            self._interp_j = jax.jit(interpolate_ice_to_time)
        self.state = self._interp_j(self.state, jnp.asarray(self.time))
        # fire events due exactly AT t_end: the loop above exits first,
        # but the reference writes output when region%time lands on an
        # output time, including the final one (run_model_region) - the
        # parity harness caught the missing final frame
        self._run_components()
        self.wallclock = _time.perf_counter() - t0_wall
        return self.state

    def _run_components(self):
        C = self.C
        t = self.time
        eps = 1e-9
        if not hasattr(self, "_interp_j"):
            self._interp_j = jax.jit(interpolate_ice_to_time)
        s = self._interp_j(self.state, jnp.asarray(t))
        masks = fg = None

        def need(name):
            return self.t_next[name] <= t + eps

        # fused fast path: all cheap components due together
        fuse_names = ("climate", "ocean", "SMB", "BMB", "LMB")
        if (getattr(self, "_can_fuse_components", False)
                and all(need(nm) for nm in fuse_names)):
            (self.climate, self._T_surf, self.ocean, self.SMB,
             self.BMB, self.LMB, self.AMB) = self._components_all(
                self.md, self.state, jnp.asarray(t))
            for nm in fuse_names:
                self.t_next[nm] = self.t_next[nm] + self.dt_comp[nm]

        def bump(name):
            self.t_next[name] = self.t_next[name] + self.dt_comp[name]

        if need("climate"):
            self.climate = self.run_climate(t, s)
            self._T_surf = self.climate["T2m"].mean(axis=1)
            bump("climate")
        if need("ocean"):
            self.ocean = self.run_ocean(t, s)
            bump("ocean")
        if need("SMB"):
            self.SMB = self.run_smb(t, s, climate=self.climate)
            bump("SMB")
        if need("BMB") or need("LMB"):
            masks, fg = self._masks_fracs(self.md, s.Hi, s.Hb, s.SL)
        if need("BMB"):
            self.BMB = self.run_bmb(t, s, masks, fg, self.ocean)
            bump("BMB")
        if need("LMB"):
            self.LMB = self.run_lmb(t, s, masks)
            bump("LMB")
        if need("basal_hydro"):
            if C.choice_basal_hydrology_model == "Salle2025":
                from ..core.ice.hydrology_salle2025 import \
                    run_salle2025_leg
                if masks is None:
                    masks, fg = self._masks_fracs(self.md, s.Hi, s.Hb,
                                                  s.SL)
                # base velocities on the a-grid (reference: ice%u_base)
                u_base_a = self.md.M_map_b_a @ s.u_3D_b[:, -1]
                v_base_a = self.md.M_map_b_a @ s.v_3D_b[:, -1]
                self.hydro_state, N_til, _ = run_salle2025_leg(
                    C, self.md, self.hydro_state, s.Hi, s.Hb,
                    masks["mask_grounded_ice"], u_base_a, v_base_a)
                self.md.extras["hydro_N_eff"].arr = N_til
            bump("basal_hydro")     # always bump: a stray event must not
        if need("tracers"):         # stall the scheduler
            if C.choice_tracer_tracking_model == "particles":
                dt_tr = self.dt_comp["tracers"]
                self._tracer_key, sub = jax.random.split(self._tracer_key)
                self.tracer_state = self._tracer_spawn(
                    self.tracer_state, s, t, sub)
                self.tracer_state = self._tracer_step(
                    self.tracer_state, s, jnp.asarray(dt_tr), t)
            bump("tracers")
        if need("GIA") and self.C.choice_GIA_model != "none":
            dHb_dt, dHb = self.run_gia(t, s, self.dt_comp["GIA"])
            self.state = self.state.replace(
                dHb=dHb, Hb=self.state.Hb + (dHb - self.state.dHb))
            bump("GIA")
        if need("thermo") and self.do_thermo and not self._thermo_fused:
            Ti_new, _ = self._thermo_step(self.md, s, self._T_surf,
                                          self.SMB, self.BMB)
            self.state = self.state.replace(Ti=Ti_new)
            bump("thermo")
        if need("bed_roughness") and getattr(self, "do_nudging", False):
            if (C.bed_roughness_nudging_t_start <= t
                    <= C.bed_roughness_nudging_t_end):
                if masks is None:
                    masks = determine_masks(self.md, s.Hi, s.Hb, s.SL)
                Hi_PD, Hb_PD = self.refgeo_PD
                from ..core.ice.geometry import ice_surface_elevation
                tgt_Hs = ice_surface_elevation(
                    jnp.asarray(Hi_PD), jnp.asarray(Hb_PD), s.SL)
                self.bed_roughness_state = self._nudge_step(
                    s, masks, self.bed_roughness_state, tgt_Hs,
                    jnp.asarray(Hi_PD))
                self.state = self.state.replace(
                    bed_roughness=self.bed_roughness_state.generic)
            bump("bed_roughness")
        if need("checksum"):
            if self.checksum.enabled:
                self._log_checksums()
            bump("checksum")
        if need("output"):
            self.write_output()
            bump("output")
        if need("output_restart"):
            if self.output_dir is not None:
                from ..io.output_files import write_restart_file
                write_restart_file(
                    Path(self.output_dir) / f"restart_{self.name}_00001.nc",
                    self.mesh, self.state, self.time,
                    host_counters={"n_dt_ice": int(self.n_dt_ice)})
            bump("output_restart")


# ---------------------------------------------------------------------------
# Adaptive mesh updates (UFEMISM_main_model.f90:1211-1474)
# ---------------------------------------------------------------------------

def calc_mesh_fitness_coefficient(C, mesh, state):
    """Fraction of grounding-line/calving-front vertices still meeting
    their target resolution (calc_mesh_fitness_coefficient, :1356)."""
    import numpy as np
    gl = np.asarray(state.mask_gl_gr) | np.asarray(state.mask_gl_fl)
    cf = np.asarray(state.mask_cf_gr) | np.asarray(state.mask_cf_fl)
    R = mesh.R
    tol = C.mesh_resolution_tolerance
    n_tot = int(gl.sum() + cf.sum())
    if n_tot == 0:
        return 1.0
    bad_gl = gl & (R > C.maximum_resolution_grounding_line * tol)
    bad_cf = cf & (R > C.maximum_resolution_calving_front * tol)
    return 1.0 - (int(bad_gl.sum()) + int(bad_cf.sum())) / n_tot


def _region_update_mesh(region):
    """Create a new mesh fitted to the current geometry and remap all
    state onto it (update_mesh, :1211)."""
    import numpy as np
    import jax.numpy as jnp
    from ..mesh.grids import setup_square_grid
    from ..remap import get_map
    from ..mesh.creation import build_mesh_from_gridded_geometry
    from ..core.mesh_data import build_mesh_data
    from ..core.ice.pc import make_pc_step
    from ..core.ice.state import init_ice_state

    C = region.C
    old_mesh = region.mesh
    old_md_extras = dict(region.md.extras)
    s = region.state
    region.n_mesh_updates = getattr(region, "n_mesh_updates", 0) + 1

    # rasterise current geometry to a temp grid for feature extraction
    dx = max(min(C.maximum_resolution_grounding_line,
                 C.maximum_resolution_calving_front) / 2.0,
             old_mesh.R.min())
    g = setup_square_grid(old_mesh.xmin, old_mesh.xmax,
                          old_mesh.ymin, old_mesh.ymax, dx)
    Mg = get_map(old_mesh, g, method="trilin")
    Hi_g = (Mg @ np.asarray(s.Hi)).reshape(g.nx, g.ny)
    Hb_g = (Mg @ np.asarray(s.Hb)).reshape(g.nx, g.ny)
    SL_g = (Mg @ np.asarray(s.SL)).reshape(g.nx, g.ny)

    new_mesh = build_mesh_from_gridded_geometry(
        C, region.name, g.x, g.y, Hi_g, Hb_g, SL_g)

    # remap the FULL model state via the fields registry (every field
    # transfers per its metadata - conservative / trilinear / reinit /
    # copy; the reference's remap-everything walk,
    # UFEMISM_main_model.f90:1311-1323)
    from ..core.fields import remap_ice_state
    from ..remap.conservative import build_map_nearest
    M_cons_a = get_map(old_mesh, new_mesh)
    M_tri_a = get_map(old_mesh, new_mesh, method="trilin")
    M_b = build_map_nearest(old_mesh.TriGC, new_mesh.TriGC,
                            old_mesh.nTri)

    region.mesh = new_mesh
    dtype = jnp.float32 if C.tpu_precision == "f32" else None
    glen_scale = (s_md.extras.get("glen_A_scale")
                  if (s_md := region.md).extras else None)
    region.md = build_mesh_data(new_mesh, dtype=dtype)
    if glen_scale is not None:
        region.md.extras["glen_A_scale"] = glen_scale
    Hi_new = jnp.maximum(0.0, jnp.asarray(M_cons_a @ np.asarray(s.Hi)))
    new_state = init_ice_state(region.md, Hi_new,
                               jnp.asarray(M_cons_a @ np.asarray(s.Hb)),
                               jnp.asarray(M_tri_a @ np.asarray(s.SL)),
                               nz=C.nz, dt_init=float(s.pc.dt_np1))
    new_state = remap_ice_state(s, new_state, (M_cons_a, M_b),
                                (M_tri_a, M_b))
    Hi_new = Hi_new.astype(new_state.Hi.dtype)   # scipy remap yields f64
    # reinitialise the PC controller from scratch at dt_ice_min exactly
    # like the reference (remap_pc_scheme,
    # predictor_corrector_scheme.f90:645-658): carrying the pre-remesh
    # dt forward makes the first post-remesh step walk dt down through
    # the full retry cascade (9 attempts x ~22 cold viscosity its x
    # ~260 Krylov its ~= 50k Krylov its in ONE dispatch on the MISMIP+
    # 5 km spinup), which exceeds the remote TPU worker's liveness
    # watchdog and kills it (gates_r3b.log, root-caused 2026-08-19)
    from ..core.ice.state import PCState
    pc0 = new_state.pc
    new_state = new_state.replace(
        Hi=Hi_new, Hi_prev=Hi_new, Hi_next=Hi_new,
        t_Hi_prev=s.t_Hi_next, t_Hi_next=s.t_Hi_next,
        dt_ice=jnp.asarray(C.dt_ice_min, new_state.dt_ice.dtype),
        pc=PCState(
            dt_n=jnp.asarray(C.dt_ice_min, pc0.dt_n.dtype),
            dt_np1=jnp.asarray(C.dt_ice_min, pc0.dt_np1.dtype),
            eta_n=jnp.asarray(C.pc_epsilon, pc0.eta_n.dtype),
            eta_np1=jnp.asarray(C.pc_epsilon, pc0.eta_np1.dtype),
            dHi_dt_Hi_nm1_u_nm1=jnp.zeros_like(
                pc0.dHi_dt_Hi_nm1_u_nm1),
            tau_np1=jnp.zeros_like(pc0.tau_np1)))
    region.state = new_state

    # rebuild jitted machinery + component models on the new mesh
    Hi_PD, Hb_PD = region.refgeo_PD
    M_pd = get_map(old_mesh, new_mesh, method="trilin")
    region.refgeo_PD = (M_pd @ Hi_PD, M_pd @ Hb_PD)
    region._bedrock_cdfs = _build_bedrock_cdfs(C, region.mesh, region.name,
                                               region.md)
    region.pc_step = make_pc_step(C, region.md,
                                  refgeo_Hi=region.refgeo_PD[0],
                                  refgeo_Hb=region.refgeo_PD[1],
                                  bedrock_cdfs=region._bedrock_cdfs)
    from ..core.ice.pc import make_pc_multistep as _mkms
    from ..models.climate import make_run_climate
    from ..models.ocean import make_run_ocean
    from ..models.smb import make_run_smb
    from ..models.bmb import make_run_bmb
    from ..models.lmb import make_run_lmb
    from ..models.amb import make_run_amb
    from ..models.gia import make_run_gia
    old_runners = (region.run_climate, region.run_ocean, region.run_smb)
    region.run_climate = make_run_climate(C, region.md, region.name,
                                          mesh=region.mesh)
    region.run_ocean = make_run_ocean(C, region.md, region.name,
                                      mesh=region.mesh)
    region.run_smb = make_run_smb(C, region.md, region.name)
    region.run_bmb = make_run_bmb(
        C, region.md, region.name,
        target_geometry=region._bmb_target_geometry)
    region.run_lmb = make_run_lmb(C, region.md, region.name)
    region.run_amb = make_run_amb(C, region.md, region.name)
    region.run_gia = make_run_gia(C, region.md, region.name, region.mesh)

    # stateful runners (IMAU-ITM firn/albedo, matrix-climate albedo,
    # nudge2D deltaT) carry their state across the rebuild via trilinear
    # remap instead of re-initialising (the reference remaps every
    # component's state on mesh update, UFEMISM_main_model.f90:1311-1335)
    def _remap_tri(arr):
        a = np.asarray(arr)
        return jnp.asarray(M_tri_a @ a, dtype=arr.dtype)

    for new_r, old_r in zip((region.run_climate, region.run_ocean,
                             region.run_smb), old_runners):
        if (hasattr(new_r, "carry_state_from")
                and type(new_r) is type(old_r)):
            new_r.carry_state_from(old_r, _remap_tri)

    # bed-roughness nudging: the nudged parameter was remapped with the
    # ice state (fields registry row 'bed_roughness'); re-point the
    # region-held inversion state at it and rebuild the nudge step's
    # mesh-sized closures
    from ..models.bed_roughness import (BedRoughnessState,
                                        make_run_bed_roughness_nudging)
    region.bed_roughness_state = BedRoughnessState(
        generic=region.state.bed_roughness)
    if getattr(region, "do_nudging", False):
        region._nudge_step = make_run_bed_roughness_nudging(C, region.md)

    # Salle2025 transient hydrology: remap till/sheet water + pressure
    # and re-register the effective-pressure extras slot on the new md
    # (basal_hydrology_new.f90:1449-1491 remaps these on mesh update)
    if C.choice_basal_hydrology_model == "Salle2025":
        from ..core.ice.hydrology_salle2025 import Salle2025State
        from ..core.mesh_data import EField
        from ..utils.constants import ice_density as _rho_i, grav as _g
        hs = region.hydro_state
        region.hydro_state = Salle2025State(
            W=jnp.maximum(0.0, _remap_tri(hs.W)),
            W_til=jnp.maximum(0.0, _remap_tri(hs.W_til)),
            P=_remap_tri(hs.P))
        old_slot = old_md_extras.get("hydro_N_eff")
        N_eff = (_remap_tri(old_slot.arr) if old_slot is not None
                 else _rho_i * _g * region.state.Hi)
        region.md.extras["hydro_N_eff"] = EField(N_eff, "V")

    # Lagrangian tracers: particles live in physical coordinates and
    # carry over unchanged; the point-location tables and stepper
    # closures are mesh-sized and must be rebuilt
    if C.choice_tracer_tracking_model == "particles":
        from ..models.tracers import PointLocator, make_tracer_stepper
        loc = PointLocator(region.mesh)
        (region._tracer_init, region._tracer_step,
         region._tracer_spawn, region._tracer_to_mesh) = \
            make_tracer_stepper(C, region.md, loc)
        ts = region.tracer_state
        region.tracer_state = ts._replace(
            x=ts.x.astype(region.md.A.dtype),
            y=ts.y.astype(region.md.A.dtype))
    if region.do_thermo:
        from ..core.ice.thermodynamics import (make_heat_solver,
                                               make_geothermal_flux,
                                               register_thermo_static,
                                               run_thermodynamics)
        register_thermo_static(region.md)
        region._heat_solver = make_heat_solver(C, region.md)
        region._geothermal = make_geothermal_flux(C, region.md)
        heat = region._heat_solver
        dt_th = C.dt_thermodynamics
        region._thermo_step = jax.jit(
            lambda md_, st, T_surf, SMB, BMB: run_thermodynamics(
                C, md_, st, dt_th, T_surf, SMB, BMB, heat))
        region._thermo_step_raw = \
            lambda md_, st, T_surf, SMB, BMB: run_thermodynamics(
                C, md_, st, dt_th, T_surf, SMB, BMB, heat)
    region.pc_multistep = _mkms(
        C, region.pc_step,
        thermo_step=region._thermo_step if region._thermo_fused else None)
    # distributed mode: the halo tables/specs are mesh-shaped - rebuild
    if getattr(region, "_dist", None) is not None:
        from ..parallel.dist import ShardedModel
        region._dist = ShardedModel(C, region, region._n_dev)
    # the fused component dispatch captured the OLD mesh's closures
    region._build_component_dispatch()

    # refresh component forcings inline (the reference instead resets
    # every component t_next to now, UFEMISM_main_model.f90:1326-1335;
    # refreshing here is equivalent without double-advancing the
    # stateful runners' carried history)
    t = region.time
    region.climate = region.run_climate(t, region.state)
    region._T_surf = region.climate["T2m"].mean(axis=1)
    region.ocean = region.run_ocean(t, region.state)
    region.SMB = region.run_smb(t, region.state, climate=region.climate)
    from ..core.ice.masks import determine_masks
    from ..core.ice.subgrid import calc_grounded_fractions_bilin_TAF
    m0 = determine_masks(region.md, region.state.Hi, region.state.Hb,
                         region.state.SL)
    fg0 = calc_grounded_fractions_bilin_TAF(
        region.md, region.state.Hi, region.state.Hb, region.state.SL,
        m0["mask_floating_ice"])
    region.BMB = region.run_bmb(t, region.state, m0, fg0, region.ocean)
    region.LMB = region.run_lmb(t, region.state, m0)
    region.AMB = region.run_amb(t, region.state)
    region._rotate_outputs_for_new_mesh()  # new mesh -> next file generation
    # reset the dispatch-chunk estimator: the new mesh means a fresh
    # compile and a different per-step cost, and a large carried chunk
    # (compile + N steps in one dispatch) trips the remote tunnel's
    # liveness watchdog exactly like the cold-start case
    if hasattr(region, "_ff_steps"):
        region._ff_steps = 1
    # drop every compiled executable from the old mesh generation: the
    # remote TPU worker dies after a handful of in-process remeshes
    # (each generation re-jits ~10 programs at new shapes and the old
    # ones stay loaded), observed as 'TPU worker crashed' exactly at
    # 'updating mesh' (gates_r3b.log, 2026-08-18). Recompiles of the
    # live generation ride the persistent compilation cache.
    jax.clear_caches()
    region.t_last_mesh_update = t
    # checkpoint the remeshed state IMMEDIATELY: the first dispatch at
    # the new shapes is where the remote TPU worker historically dies
    # (gates_r3b.log), and without a post-remesh restart every retry
    # redoes the whole remesh in-process and dies the same way. With
    # it, a crashed attempt resumes straight onto the new mesh in a
    # fresh process (the gate resume path rebuilds the mesh from the
    # restart's V/Tri, integrated_tests._mismip_resume_region).
    region.write_restart()


ModelRegion.update_mesh = _region_update_mesh
ModelRegion.calc_mesh_fitness = staticmethod(calc_mesh_fitness_coefficient)


def _build_bedrock_cdfs(C, mesh, region_name, md):
    """Host-side bedrock CDFs + border-triangle mask for the sub-grid
    grounded-fraction scheme; None when the choice doesn't need them or
    no raw bedrock grid exists (initialise_bedrock_CDFs)."""
    if "bedrock_CDF" not in C.choice_subgrid_grounded_fraction:
        return None
    from ..core.ice.bedrock_cdf import build_bedrock_cdfs_from_config
    pair = build_bedrock_cdfs_from_config(C, mesh, region_name)
    if pair is None:
        return None
    cdf_a, cdf_b = pair
    mask_border_b = (mesh.TriC < 0).any(axis=1)
    dtype = md.A.dtype
    return (jnp.asarray(cdf_a, dtype), jnp.asarray(cdf_b, dtype),
            jnp.asarray(mask_border_b))
