"""Predictor-corrector ice-thickness time stepping (Robinson et al. 2020).

Re-design of src/UFEMISM/ice_dynamics/time_stepping/
predictor_corrector_scheme.f90:34-326 as a single jitted state->state
function: the truncation-error retry loop becomes a lax.while_loop whose
carry holds (dt, iterate fields); the adaptive dt controller (Eq. 33), the
predictor (Eq. 30), stress-balance solve on the predicted geometry, and the
corrector all run on-device in one XLA program per ice-dynamics step.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Device-liveness Krylov budgets (see the cond() notes below). Sized so
# that a budget-capped step/dispatch stays well under the remote TPU
# worker's ~2-min blocking-call watchdog at the measured ~2.5 ms/it;
# healthy steps use ~100-500 its so these trip only in pathology. The
# watchdog only exists on the remote (axon) backend - local CPU runs
# (tests, parity harness, reference configs with visc_it_nit=5000) must
# run their solves to completion, so the valves default OFF there.
_ON_AXON = "axon" in os.environ.get("JAX_PLATFORMS", "")


def _budget(env, axon_default):
    return int(os.environ.get(env, str(axon_default if _ON_AXON
                                       else 2 ** 30)))


_AXB_STEP_BUDGET = _budget("UF_AXB_STEP_BUDGET", 16000)
_AXB_DISPATCH_BUDGET = _budget("UF_AXB_DISPATCH_BUDGET", 6000)

from ...parallel import comm
from ..mesh_data import MeshData, EField
from .geometry import ice_surface_elevation, thickness_above_flotation
from .masks import determine_masks, calc_mask_noice
from .subgrid import (calc_effective_thickness,
                      calc_grounded_fractions_bilin_TAF,
                      calc_grounded_fractions_b_from_a,
                      calc_grounded_fractions)
from .rheology import calc_ice_rheology_glen
from .mass import (calc_dHi_dt, calc_critical_timestep_adv,
                   make_bc_masks, make_divQ_operator)
from .safeties import alter_ice_thickness, calc_and_apply_spill_over_flux
from .state import IceState, PCState
from . import sia as sia_mod


class _PCCarry(NamedTuple):
    it: jnp.ndarray
    dt: jnp.ndarray
    eta: jnp.ndarray
    Hi_star: jnp.ndarray
    Hi_np1: jnp.ndarray
    dHdt_n: jnp.ndarray
    dHdt_np1: jnp.ndarray
    u_vav_b: jnp.ndarray
    v_vav_b: jnp.ndarray
    u_3D_b: jnp.ndarray
    v_3D_b: jnp.ndarray
    divQ: jnp.ndarray
    aux: dict                      # solver warm-start state (tau_b, eta)
    n_visc_its: jnp.ndarray
    n_Axb_its: jnp.ndarray
    done: jnp.ndarray


def make_solve_stress_balance(C, md: MeshData, bedrock_cdfs=None):
    """Velocity solver dispatch (conservation_of_momentum_main.f90:37).

    Returns fn(md, Hi, Hs, Hb, SL, Ti, state) ->
      (u_vav_b, v_vav_b, u_3D_b, v_3D_b, n_visc_its, n_Axb_its, aux)
    where aux is a dict of solver warm-start state written back into the
    IceState after the step (the reference keeps the equivalent fields
    in its persistent per-solver types, e.g.
    type_ice_velocity_solver_DIVA).
    """
    choice = C.choice_stress_balance_approximation

    def _aux_passthrough(s):
        # solvers without their own warm-start state carry the fields
        # through unchanged so the state pytree structure is stable
        return {"visc_tau_bx": s.visc_tau_bx,
                "visc_tau_by": s.visc_tau_by,
                "visc_eta_3D_b": s.visc_eta_3D_b}

    if choice == "none":
        def solve(md, Hi, Hs, Hb, SL, Ti, s):
            z = jnp.zeros_like(s.u_vav_b)
            z3 = jnp.zeros_like(s.u_3D_b)
            return (z, z, z3, z3, jnp.int32(0), jnp.int32(0),
                    _aux_passthrough(s))
        return solve

    if choice == "SIA":
        def solve(md, Hi, Hs, Hb, SL, Ti, s):
            masks = determine_masks(md, Hi, Hb, SL)
            A_flow = calc_ice_rheology_glen(
                C, md, Hi, Hs, Ti, masks["mask_grounded_ice"],
                masks["mask_floating_ice"])
            u3, v3, _, _, _, uv, vv = sia_mod.solve_SIA(C, md, Hi, Hs, A_flow)
            return (uv, vv, u3, v3, jnp.int32(0), jnp.int32(0),
                    _aux_passthrough(s))
        return solve

    if choice in ("SSA", "DIVA", "SIA/SSA"):
        from .ssadiva import make_solve_ssa_diva
        return make_solve_ssa_diva(C, md, choice)

    if choice == "BPA":
        from .bpa import make_solve_bpa
        solve6 = make_solve_bpa(C, md, bedrock_cdfs=bedrock_cdfs)

        def solve(md, Hi, Hs, Hb, SL, Ti, s):
            return (*solve6(md, Hi, Hs, Hb, SL, Ti, s),
                    _aux_passthrough(s))
        return solve

    if choice == "hybrid DIVA/BPA":
        from .hybrid import make_solve_hybrid, resolve_hybrid_mask
        # region inference: the mask choice keys are per-region; find the
        # one that is set (UFEMISM passes region_name through the solver
        # init; here the config carries it)
        region = getattr(C, "_current_region", None) or next(
            (r for r in ("ANT", "EAS", "GRL", "NAM")
             if getattr(C, f"choice_hybrid_DIVA_BPA_mask_{r}")), "ANT")
        mask_BPA_b = resolve_hybrid_mask(C, md._host_mesh, region)
        solve6 = make_solve_hybrid(C, md, mask_BPA_b,
                                   bedrock_cdfs=bedrock_cdfs)

        def solve(md, Hi, Hs, Hb, SL, Ti, s):
            return (*solve6(md, Hi, Hs, Hb, SL, Ti, s),
                    _aux_passthrough(s))
        return solve

    raise ValueError(
        f"stress balance '{choice}' not implemented yet")


def make_pc_step(C, md: MeshData, refgeo_Hi=None, refgeo_Hb=None,
                 bedrock_cdfs=None, jit=True):
    """Build the jitted PC step: (md, state, dt_max) -> state.

    refgeo_Hi/Hb: present-day reference geometry on the mesh (used by
    alter_ice_thickness fixiness/limitness; zeros disable those paths).
    All per-entity static data rides md.extras, so the same step function
    works inside a shard_map over the device mesh (jit=False returns the
    raw function for such wrapping).
    """
    eps = C.pc_epsilon
    k_I, k_p = C.pc_k_I, C.pc_k_p
    eta_min = C.pc_eta_min
    dt_min = C.dt_ice_min
    dt_maxc = C.dt_ice_max
    growth = C.pc_max_time_step_increase
    nit_max = C.pc_nit_max

    # register static per-entity fields before building solvers (no-ops
    # when already present, e.g. on a converted multi-chip MeshData)
    from .subgrid import register_bedrock_cdfs
    register_bedrock_cdfs(md, bedrock_cdfs)
    if "refgeo_Hi" not in md.extras:
        z = jnp.zeros(md.nV, md.A.dtype)
        md.extras["refgeo_Hi"] = EField(
            z if refgeo_Hi is None else jnp.asarray(refgeo_Hi, md.A.dtype),
            "V")
        md.extras["refgeo_Hb"] = EField(
            z if refgeo_Hb is None else jnp.asarray(refgeo_Hb, md.A.dtype),
            "V")

    solve_stress_balance = make_solve_stress_balance(C, md)

    def pc_step(md, s: IceState, dt_max,
                SMB=None, BMB=None, LMB=None, AMB=None):
        # md: runtime MeshData pytree (jit argument). Passing it per call -
        # instead of closing over it - keeps the multi-MB operator arrays
        # out of the XLA constant pool (faster compiles; the axon remote
        # backend crashes on very large inline constants).
        zerosSMB = jnp.zeros_like(s.Hi)
        SMB = zerosSMB if SMB is None else SMB
        BMB = zerosSMB if BMB is None else BMB
        LMB = zerosSMB if LMB is None else LMB

        mask_noice = calc_mask_noice(md, C.choice_mask_noice)
        bc_masks = make_bc_masks(C, md)
        refgeo_Hi = md.x("refgeo_Hi")
        refgeo_Hb = md.x("refgeo_Hb")

        Hb, SL, Ti = s.Hb, s.SL, s.Ti

        # -- new time step (Robinson 2020 Eq. 33) --------------------------
        dt_n = s.pc.dt_np1
        dt = ((eps / s.pc.eta_np1) ** (k_I + k_p)
              * (eps / s.pc.eta_n) ** (-k_p) * dt_n)
        dt = jnp.minimum(dt, dt_max)
        dt = jnp.minimum(dt, growth * dt_n)
        dt = jnp.maximum(dt, dt_min)

        # previous state
        Hi_prev = jnp.where(mask_noice, 0.0, s.Hi_next)
        dHdt_nm1 = jnp.where(mask_noice, 0.0, s.dHi_dt)
        eta_n = s.pc.eta_np1

        masks_prev = determine_masks(md, Hi_prev, Hb, SL)
        dt_crit = calc_critical_timestep_adv(
            C, md, Hi_prev, masks_prev["mask_floating_ice"],
            s.u_vav_b, s.v_vav_b)
        dt = jnp.minimum(dt, dt_crit)

        fraction_gr, fraction_gr_b = calc_grounded_fractions(
            C, md, Hi_prev, Hb, SL, masks_prev["mask_floating_ice"],
            dHb=s.dHb)
        Hi_eff, fraction_margin = calc_effective_thickness(md, Hi_prev, Hb, SL)

        # truncation-error mask: interior grounded, fully grounded, not GL
        tau_mask = (masks_prev["mask_grounded_ice"]
                    & ~masks_prev["mask_gl_gr"] & (fraction_gr == 1.0))

        def body(c: _PCCarry) -> _PCCarry:
            dt_i = c.dt                      # f64 time bookkeeping
            zeta_t = dt_i / dt_n
            fdt = Hi_prev.dtype              # field dtype (f32 in perf mode)
            dtf = dt_i.astype(fdt)
            ztf = zeta_t.astype(fdt)

            # == predictor (old velocities) ==
            dHdt_n_raw, _, _, nsi1 = calc_dHi_dt(
                C, md, Hi_prev, Hb, SL, s.u_vav_b, s.v_vav_b,
                SMB, BMB, LMB, None, fraction_margin, mask_noice,
                dtf, s.dHi_dt_target, bc_masks)
            Hi_star = Hi_prev + dtf * ((1 + ztf / 2) * dHdt_n_raw
                                       - (ztf / 2) * dHdt_nm1)
            Hi_star = alter_ice_thickness(C, md, masks_prev, Hi_prev, Hb,
                                          SL, Hi_star, refgeo_Hi, refgeo_Hb,
                                          s.t_Hi_next)
            Hi_star = jnp.maximum(0.0, jnp.where(mask_noice, 0.0, Hi_star))
            dHdt_n = (((Hi_star - Hi_prev) / dtf
                       + (ztf / 2) * dHdt_nm1) / (1 + ztf / 2))

            # == stress balance on predicted geometry ==
            Hs_star = ice_surface_elevation(Hi_star, Hb, SL)
            uv, vv, u3, v3, nvi, nai, aux = solve_stress_balance(
                md, Hi_star, Hs_star, Hb, SL, Ti, s)

            # == corrector (original geometry, new velocities) ==
            dHdt_np1_raw, _, divQ, nsi2 = calc_dHi_dt(
                C, md, Hi_prev, Hb, SL, uv, vv,
                SMB, BMB, LMB, None, fraction_margin, mask_noice,
                dtf, s.dHi_dt_target, bc_masks)
            Hi_np1 = Hi_prev + (dtf / 2) * (dHdt_n + dHdt_np1_raw)
            Hi_np1 = alter_ice_thickness(C, md, masks_prev, Hi_prev, Hb,
                                         SL, Hi_np1, refgeo_Hi, refgeo_Hb,
                                         s.t_Hi_next)
            _, u_perp, _ = make_divQ_operator(md, uv, vv, fraction_margin)
            Hi_np1, _ = calc_and_apply_spill_over_flux(
                C, md, masks_prev, Hi_eff, u_perp, Hi_np1, dtf)
            Hi_np1 = jnp.maximum(0.0, jnp.where(mask_noice, 0.0, Hi_np1))
            dHdt_np1 = (Hi_np1 - Hi_prev) / (dtf / 2) - dHdt_n

            # == truncation error (Eq. 32) ==
            tau = ztf * jnp.abs(Hi_np1 - Hi_star) \
                / ((3 * ztf + 3) * dt_n.astype(fdt))
            eta = jnp.maximum(eta_min,
                              comm.max_all(jnp.where(tau_mask, tau, 0.0)))

            if os.environ.get("UF_PC_DEBUG") == "2":
                tau_m = jnp.where(tau_mask, tau, 0.0)
                vi = jnp.argmax(tau_m)
                jax.debug.print(
                    "    tau*: vi={vi} tau={tv:.3e} dt={dt:.3f} "
                    "Hi={hi:.2f} dHs={dd:.3e} |dH*|={ds:.3e} "
                    "gl_nbr={gn}",
                    vi=vi, tv=tau_m[vi], dt=dt_i,
                    hi=Hi_prev[vi],
                    dd=(Hi_np1 - Hi_star)[vi],
                    ds=(Hi_star - Hi_prev)[vi],
                    gn=masks_prev["mask_gl_gr"][vi])
            ok = eta < eps
            at_min = dt_i <= dt_min
            done = ok | at_min
            eta_out = jnp.where(ok, eta, jnp.where(at_min, 0.95 * eps, eta))
            dt_next = jnp.where(done, dt_i,
                                jnp.maximum(dt_i * 0.8, dt_min))
            return _PCCarry(
                it=c.it + 1, dt=dt_next, eta=eta_out,
                Hi_star=Hi_star, Hi_np1=Hi_np1,
                dHdt_n=dHdt_n, dHdt_np1=dHdt_np1,
                u_vav_b=uv, v_vav_b=vv, u_3D_b=u3, v_3D_b=v3, divQ=divQ,
                aux=aux,
                n_visc_its=c.n_visc_its + nvi,
                n_Axb_its=c.n_Axb_its + nai + nsi1 + nsi2,
                done=done)

        def cond(c: _PCCarry):
            # the Krylov budget is a device-liveness valve: the remote
            # TPU worker's watchdog kills any single dispatch blocking
            # longer than ~2 min, so one step's retry cascade must never
            # be allowed to burn unbounded solver work (the reference
            # has no such physical bound - its host loop just runs long)
            return ((~c.done) & (c.it < nit_max)
                    & (c.n_Axb_its < _AXB_STEP_BUDGET))

        init = _PCCarry(
            it=jnp.int32(0), dt=dt, eta=s.pc.eta_np1,
            Hi_star=Hi_prev, Hi_np1=Hi_prev,
            dHdt_n=dHdt_nm1, dHdt_np1=dHdt_nm1,
            u_vav_b=s.u_vav_b, v_vav_b=s.v_vav_b,
            u_3D_b=s.u_3D_b, v_3D_b=s.v_3D_b, divQ=s.divQ,
            aux={"visc_tau_bx": s.visc_tau_bx,
                 "visc_tau_by": s.visc_tau_by,
                 "visc_eta_3D_b": s.visc_eta_3D_b},
            n_visc_its=jnp.int32(0), n_Axb_its=jnp.int32(0),
            done=jnp.asarray(False))
        out = jax.lax.while_loop(cond, body, init)
        if os.environ.get("UF_PC_DEBUG"):
            jax.debug.print(
                "  pc: t={t:.2f} dt={dt:.3f} (ctrl={dc:.3f} crit={cr:.3f} "
                "max={dm:.3f}) eta={eta:.2e}/eps={eps:.0e} retries={it} "
                "visc={nv} axb={na}",
                t=s.t_Hi_next, dt=out.dt, dc=dt, cr=dt_crit, dm=dt_max,
                eta=out.eta, eps=eps, it=out.it - 1,
                nv=out.n_visc_its, na=out.n_Axb_its)

        # -- finalise: new prediction window -------------------------------
        t_next = s.t_Hi_next + out.dt
        Hi_next = out.Hi_np1
        dHi_dt = (Hi_next - Hi_prev) / out.dt.astype(Hi_next.dtype)

        return s.replace(
            t_Hi_prev=s.t_Hi_next, t_Hi_next=t_next,
            Hi_prev=Hi_prev, Hi_next=Hi_next,
            dHi_dt=dHi_dt, divQ=out.divQ,
            u_vav_b=out.u_vav_b, v_vav_b=out.v_vav_b,
            u_3D_b=out.u_3D_b, v_3D_b=out.v_3D_b,
            **out.aux,
            fraction_margin=fraction_margin, fraction_gr=fraction_gr,
            fraction_gr_b=fraction_gr_b,
            Hi_eff=Hi_eff,
            mask_noice=mask_noice,
            pc=PCState(dt_n=dt_n, dt_np1=out.dt,
                       eta_n=eta_n, eta_np1=out.eta,
                       dHi_dt_Hi_nm1_u_nm1=dHdt_nm1,
                       # per-vertex truncation error of the ACCEPTED
                       # attempt (Eq. 32 with the final dt; the loop
                       # carry keeps only its max) - the reference
                       # persists ice%pc%tau_np1 and writes it as the
                       # pc_truncation_error output variable
                       tau_np1=((out.dt / dt_n).astype(Hi_next.dtype)
                                * jnp.abs(out.Hi_np1 - out.Hi_star)
                                / ((3 * out.dt / dt_n + 3) * dt_n)
                                .astype(Hi_next.dtype))),
            dt_ice=out.dt,
            n_visc_its=s.n_visc_its + out.n_visc_its,
            n_Axb_its=s.n_Axb_its + out.n_Axb_its,
            **masks_prev,
        )

    return jax.jit(pc_step) if jit else pc_step


def make_pc_multistep(C, pc_step, thermo_step=None):
    """Device-side multi-step fast-forward: advance PC steps until the
    prediction window covers t_stop, in ONE dispatch.

    The reference's outer loop returns to the (MPI) host every ice step
    (run_model_region); on TPU each host round-trip costs ~hundreds of ms
    through the dispatch path, so between component events we keep the
    whole stepping loop on-device under lax.while_loop. Component forcings
    (SMB/BMB/LMB) are frozen inside the window - exactly the reference's
    semantics, since t_stop never crosses a component event time.

    With thermo_step given, the 3-D heat equation is also advanced
    on-device at its own cadence C.dt_thermodynamics inside the window
    (the reference interleaves thermodynamics the same way,
    thermodynamics_main.f90), so thermo no longer fragments the window
    into per-dt_thermo host round-trips.
    """
    dt_min = C.dt_ice_min
    dt_th = C.dt_thermodynamics

    if thermo_step is None:
        def multi(md, s, t_stop, dt_max, SMB, BMB, LMB,
                  n_max=jnp.int32(2 ** 30)):
            axb0 = s.n_Axb_its

            def cond(c):
                s, n = c
                # n_max hard-bounds the dispatch length: the remote-TPU
                # tunnel kills dispatches that run for minutes ('TPU
                # worker crashed'), and a dt collapse inside the window
                # would otherwise turn a 50-yr t_stop into 500 steps.
                # run_to adapts n_max to a wall-clock target. The Krylov
                # budget catches solver-effort spikes MID-dispatch that
                # the measured steps/s chunking cannot see (trajectory
                # unchanged - the host just re-dispatches).
                return ((s.t_Hi_next < t_stop - 1e-9) & (n < n_max)
                        & (s.n_Axb_its - axb0 < _AXB_DISPATCH_BUDGET))

            def body(c):
                s, n = c
                # do NOT clamp dt to land on t_stop: the reference's ice
                # window freely overshoots component/output events and the
                # region interpolates Hi inside it (ice_dynamics_main.f90:
                # 85-121 passes dt_max = C%dt_ice_max unconditionally).
                # Clamping re-trapped the dt controller at every window
                # boundary: the growth ladder (1.1x/step) restarted from
                # the sliver step (~0.1 yr) left before each 5-yr event.
                return (pc_step(md, s, dt_max, SMB=SMB, BMB=BMB, LMB=LMB),
                        n + 1)

            return jax.lax.while_loop(cond, body, (s, jnp.int32(0)))

        return jax.jit(multi)

    def multi_th(md, s, t_stop, dt_max, SMB, BMB, LMB, T_surf, t_th0,
                 n_max=jnp.int32(2 ** 30)):
        axb0 = s.n_Axb_its

        def cond(c):
            s, n, t_th = c
            return ((s.t_Hi_next < t_stop - 1e-9) & (n < n_max)
                    & (s.n_Axb_its - axb0 < _AXB_DISPATCH_BUDGET))

        def body(c):
            s, n, t_th = c
            # overshoot semantics: see the non-thermo multi() body above
            s = pc_step(md, s, dt_max, SMB=SMB, BMB=BMB, LMB=LMB)

            # catch thermo up to the new prediction time (possibly several
            # dt_th boundaries if the ice step out-paced them)
            def th_cond(c2):
                s2, t2 = c2
                return t2 <= s.t_Hi_next + 1e-9

            def th_body(c2):
                s2, t2 = c2
                si = interpolate_ice_to_time(s2, t2)
                Ti_new, _ = thermo_step(md, si, T_surf, SMB, BMB)
                return s2.replace(Ti=Ti_new), t2 + dt_th

            s, t_th = jax.lax.while_loop(th_cond, th_body, (s, t_th))
            return (s, n + 1, t_th)

        return jax.lax.while_loop(cond, body, (s, jnp.int32(0), t_th0))

    return jax.jit(multi_th)


def interpolate_ice_to_time(s: IceState, t):
    """Hi at model time t inside the prediction window + derived geometry
    (ice_dynamics_main.f90:114-121)."""
    w = jnp.where(s.t_Hi_next > s.t_Hi_prev,
                  (t - s.t_Hi_prev) / jnp.maximum(s.t_Hi_next - s.t_Hi_prev,
                                                  1e-30), 1.0)
    w = jnp.clip(w, 0.0, 1.0).astype(s.Hi_prev.dtype)
    Hi = (1 - w) * s.Hi_prev + w * s.Hi_next
    Hs = ice_surface_elevation(Hi, s.Hb, s.SL)
    return s.replace(Hi=Hi, Hs=Hs, Hib=Hs - Hi,
                     TAF=thickness_above_flotation(Hi, s.Hb, s.SL))
