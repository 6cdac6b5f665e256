"""Ice model state pytree.

TPU-native analogue of the reference's mutable type_ice_model
(src/UFEMISM/types/ice_model_types.f90:297-533): an immutable chex dataclass
threaded through pure step functions (state-in, state-out), so the whole
ice-dynamics step jits into one XLA program.
"""

from __future__ import annotations

import chex
import jax.numpy as jnp

from .geometry import ice_surface_elevation, thickness_above_flotation


@chex.dataclass
class PCState:
    """Predictor-corrector controller state (Robinson et al. 2020)."""
    dt_n: jnp.ndarray        # previous time step [yr]
    dt_np1: jnp.ndarray      # current time step [yr]
    eta_n: jnp.ndarray       # previous max truncation error
    eta_np1: jnp.ndarray     # current max truncation error
    dHi_dt_Hi_nm1_u_nm1: jnp.ndarray  # [nV] thinning rates of previous step
    tau_np1: jnp.ndarray     # [nV] truncation error field (ice%pc%tau_np1,
    #                          written as pc_truncation_error output)


@chex.dataclass
class IceState:
    """Per-vertex/triangle ice model state."""
    # geometry (a-grid)
    Hi: jnp.ndarray          # [nV] ice thickness
    Hb: jnp.ndarray          # [nV] bedrock elevation
    SL: jnp.ndarray          # [nV] sea level
    Hs: jnp.ndarray          # [nV] surface elevation
    Hib: jnp.ndarray         # [nV] ice base elevation
    TAF: jnp.ndarray         # [nV] thickness above flotation
    dHb: jnp.ndarray         # [nV] bedrock deformation (GIA)

    # rates
    dHi_dt: jnp.ndarray      # [nV]
    divQ: jnp.ndarray        # [nV]
    dHi_dt_target: jnp.ndarray  # [nV] (inversion target; zero by default)

    # prediction window
    t_Hi_prev: jnp.ndarray   # scalar [yr]
    t_Hi_next: jnp.ndarray
    Hi_prev: jnp.ndarray     # [nV]
    Hi_next: jnp.ndarray     # [nV]

    # masks
    mask_noice: jnp.ndarray          # [nV] bool
    mask_icefree_land: jnp.ndarray
    mask_icefree_ocean: jnp.ndarray
    mask_grounded_ice: jnp.ndarray
    mask_floating_ice: jnp.ndarray
    mask_margin: jnp.ndarray
    mask_gl_gr: jnp.ndarray
    mask_gl_fl: jnp.ndarray
    mask_cf_gr: jnp.ndarray
    mask_cf_fl: jnp.ndarray
    mask_coastline: jnp.ndarray
    mask: jnp.ndarray                # [nV] int

    # sub-grid
    fraction_margin: jnp.ndarray     # [nV]
    fraction_gr: jnp.ndarray         # [nV] grounded fraction (a)
    fraction_gr_b: jnp.ndarray       # [nTri] grounded fraction (b)
    Hi_eff: jnp.ndarray              # [nV]

    # rheology
    A_flow: jnp.ndarray              # [nV,nz] Glen flow factor

    # basal conditions
    bed_roughness: jnp.ndarray       # [nV] generic (nudgable) roughness

    # velocities
    u_vav_b: jnp.ndarray             # [nTri]
    v_vav_b: jnp.ndarray             # [nTri]
    u_3D_b: jnp.ndarray              # [nTri,nz]
    v_3D_b: jnp.ndarray              # [nTri,nz]

    # stress-balance solver warm-start state: the reference's DIVA
    # solver keeps tau_b / eta_3D in type_ice_velocity_solver_DIVA
    # BETWEEN solves (and restarts them, create_restart_file_DIVA), so
    # iteration 1 of a new solve sees the previous step's converged
    # vertical-shear feedback. Without these the viscosity iteration
    # re-converges that feedback from zero every step (~20 extra its).
    visc_tau_bx: jnp.ndarray         # [nTri] basal shear stress x
    visc_tau_by: jnp.ndarray         # [nTri]
    visc_eta_3D_b: jnp.ndarray       # [nTri,nz] effective viscosity

    # thermodynamics
    Ti: jnp.ndarray                  # [nV,nz] englacial temperature

    # pc controller
    pc: PCState

    # solver-effort counters (scoreboard metrics)
    dt_ice: jnp.ndarray              # scalar, last dt
    n_visc_its: jnp.ndarray          # int
    n_Axb_its: jnp.ndarray           # int


def init_ice_state(md, Hi, Hb, SL, nz: int, dt_init: float = 0.1,
                   Ti_init: float = 270.0) -> IceState:
    """Fresh ice state from initial geometry on the mesh (a-grid arrays)."""
    nV = md.nV
    nTri = md.nTri
    dtype = md.A.dtype
    zeros_v = jnp.zeros(nV, dtype)
    zeros_t = jnp.zeros(nTri, dtype)
    f = lambda x: jnp.asarray(x, dtype)
    # time bookkeeping stays float64 even in f32 performance mode:
    # accumulating model time in f32 loses whole timesteps after ~1e7 units
    ft = lambda x: jnp.asarray(x, jnp.float64)
    Hi, Hb, SL = f(Hi), f(Hb), f(SL)
    Hs = ice_surface_elevation(Hi, Hb, SL)
    bfalse = jnp.zeros(nV, bool)
    return IceState(
        Hi=Hi, Hb=Hb, SL=SL, Hs=Hs, Hib=Hs - Hi,
        TAF=thickness_above_flotation(Hi, Hb, SL),
        dHb=zeros_v,
        dHi_dt=zeros_v, divQ=zeros_v, dHi_dt_target=zeros_v,
        t_Hi_prev=ft(0.0), t_Hi_next=ft(0.0),
        Hi_prev=Hi, Hi_next=Hi,
        mask_noice=bfalse, mask_icefree_land=bfalse,
        mask_icefree_ocean=bfalse, mask_grounded_ice=bfalse,
        mask_floating_ice=bfalse, mask_margin=bfalse,
        mask_gl_gr=bfalse, mask_gl_fl=bfalse, mask_cf_gr=bfalse,
        mask_cf_fl=bfalse, mask_coastline=bfalse,
        mask=jnp.zeros(nV, jnp.int32),
        fraction_margin=jnp.ones(nV, dtype),
        fraction_gr=jnp.ones(nV, dtype), fraction_gr_b=jnp.ones(nTri, dtype),
        Hi_eff=Hi,
        A_flow=jnp.zeros((nV, nz), dtype),
        bed_roughness=jnp.zeros(nV, dtype),
        u_vav_b=zeros_t, v_vav_b=zeros_t,
        u_3D_b=jnp.zeros((nTri, nz), dtype),
        v_3D_b=jnp.zeros((nTri, nz), dtype),
        visc_tau_bx=zeros_t, visc_tau_by=zeros_t,
        visc_eta_3D_b=jnp.full((nTri, nz), 1e4, dtype),  # = visc_eff_min
        Ti=jnp.full((nV, nz), Ti_init, dtype),
        pc=PCState(dt_n=ft(dt_init), dt_np1=ft(dt_init),
                   eta_n=f(1e-8), eta_np1=f(1e-8),
                   dHi_dt_Hi_nm1_u_nm1=zeros_v, tau_np1=zeros_v),
        dt_ice=ft(dt_init),
        n_visc_its=jnp.zeros((), jnp.int32),
        n_Axb_its=jnp.zeros((), jnp.int32),
    )
