"""Salle2025 transient basal hydrology: the Bueler & Van Pelt (2015)
two-layer (water sheet + till) subglacial hydrology model.

Re-design of src/UFEMISM/basal_hydrology/basal_hydrology_new.f90
(basal_hydrology_leg:34-75, basal_hydrology:79-156 and the calc_*
routines it calls): the reference integrates the coupled W / W_til / P
system in SI seconds with an adaptive CFL+diffusion sub-step until
`basal_hydro_equil_time` model-years have elapsed, then hands the till
effective pressure / yield stress back to the sliding laws. TPU-first
shape: the whole pseudo-time leg is ONE `lax.while_loop` whose body is
the fully-vectorised update (flux divergence as a masked neighbour
gather, gradients via the ELL operators), so a leg costs one dispatch.

Physical constants follow the reference/paper values
(basal_hydrology_new.f90: c1=0.5, c2=0.04, A=3.1689e-24 Pa^-3 s^-1,
k=0.001, alpha=1.25, beta=1.5, phi_englacial=0.01, W_r=0.1 m,
m=0.0069 m/yr w.e., Cd=0.001 m/yr, W_max_til=2 m, N0=1000 Pa,
delta=0.02, e0=0.69, Cc=0.12, till friction angle 26.565 deg).
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp
from jax import lax

from ...utils.constants import grav, ice_density, sec_per_year, pi

RHO_W = 1000.0
C1_CAVITATION = 0.5          # [m^-1]
C2_CREEP = 0.04
A_SOFTNESS = 3.1689e-24      # [Pa^-3 s^-1]
K_COND = 0.001
ALPHA = 1.25
BETA = 1.5
PHI_ENGLACIAL = 0.01
W_R = 0.1                    # [m] bed roughness scale
M_MELT = 0.0069 * RHO_W / sec_per_year   # [kg m^-2 s^-1]
CD_DRAIN = 0.001 / sec_per_year          # [m s^-1]
W_MAX = 1000.0
W_MAX_TIL = 2.0
N0_TILL = 1000.0             # [Pa]
DELTA_TILL = 0.02
E0_TILL = 0.69
CC_TILL = 0.12
PHI_TILL_DEG = 26.565


@chex.dataclass
class Salle2025State:
    W: jnp.ndarray        # [nV] water-sheet thickness [m]
    W_til: jnp.ndarray    # [nV] till water thickness [m]
    P: jnp.ndarray        # [nV] water pressure [Pa]


def init_salle2025_state(md, dtype=None):
    dtype = dtype or md.A.dtype
    z = jnp.zeros(md.nV, dtype)
    return Salle2025State(W=z, W_til=z, P=z)


def _min_tri_side(md):
    V = md.V
    a = V[md.Tri[:, 0]]
    b = V[md.Tri[:, 1]]
    c = V[md.Tri[:, 2]]
    d = jnp.stack([jnp.linalg.norm(b - a, axis=1),
                   jnp.linalg.norm(c - b, axis=1),
                   jnp.linalg.norm(a - c, axis=1)])
    return d.min(axis=0)


def _hydro_step(md, h, Hi, Hb, mask_gr, mask_b, u_base_si, v_base_si,
                dt_max_s):
    """One adaptive sub-step; returns (new state, dt taken [s])."""
    from .mass import map_b_to_c

    P_o = ice_density * grav * Hi
    W = jnp.clip(h.W, 0.0, W_MAX)
    W_til = jnp.clip(h.W_til, 0.0, W_MAX_TIL)
    P = jnp.clip(h.P, 0.0, P_o)

    # hydraulic potential and its b-grid gradient (calc_R / calc_K)
    R = (Hb + W) * RHO_W * grav + P
    dR_dx = md.M_ddx_a_b @ R
    dR_dy = md.M_ddy_a_b @ R
    W_b = md.M_map_a_b @ W
    grad2 = dR_dx ** 2 + dR_dy ** 2 + 1e-8
    K_b = jnp.where(mask_b,
                    K_COND * jnp.maximum(W_b, 0.0) ** (ALPHA - 1.0)
                    * grad2 ** ((BETA - 2.0) / 2.0), 0.0)
    D_b = RHO_W * grav * K_b * jnp.maximum(W_b, 0.0)
    u_b = -K_b * dR_dx
    v_b = -K_b * dR_dy

    # adaptive sub-step (get_basal_hydro_timestep): CFL + diffusion
    d_min = _min_tri_side(md)
    dt_cfl = (d_min / (2.0 * (jnp.abs(u_b) + jnp.abs(v_b)) + 1e-30)).min()
    dt_W = (d_min ** 2 / (8.0 * (D_b + 1e-7))).min()
    dt_P = (2.0 * PHI_ENGLACIAL * d_min ** 2 / (8.0 * (D_b + 1e-7))).min()
    dt = 0.9 * jnp.minimum(jnp.minimum(dt_cfl, dt_W),
                           jnp.minimum(dt_P, dt_max_s))

    # upwind flux divergence over Voronoi boundaries (calc_divQ)
    u_c = map_b_to_c(md, u_b)
    v_c = map_b_to_c(md, v_b)
    u_e = md.ext_E(u_c)[md.VE] if hasattr(md, "ext_E") else u_c[md.VE]
    v_e = md.ext_E(v_c)[md.VE] if hasattr(md, "ext_E") else v_c[md.VE]
    u_perp = u_e * md.D_x / md.D + v_e * md.D_y / md.D
    W_j = (md.ext_V(W) if hasattr(md, "ext_V") else W)[md.C]
    gr_j = (md.ext_V(mask_gr) if hasattr(md, "ext_V") else mask_gr)[md.C]
    LcA = jnp.where(md.mask_C, md.Cw / md.A[:, None], 0.0)
    out_flux = LcA * jnp.maximum(0.0, u_perp) * W[:, None]
    in_flux = jnp.where(gr_j, LcA * jnp.minimum(0.0, u_perp) * W_j, 0.0)
    divQ = jnp.where(mask_gr, (out_flux + in_flux).sum(axis=1), 0.0)

    # till/water partition of the source (calc_q_til)
    q_til = jnp.minimum(W_MAX_TIL - W_til + CD_DRAIN * dt,
                        (M_MELT / RHO_W) * dt)
    q_water = (CD_DRAIN + M_MELT / RHO_W) * dt - q_til

    # opening/closing (calc_opening_rate / calc_closing_rate)
    O_rate = C1_CAVITATION * jnp.sqrt(u_base_si ** 2 + v_base_si ** 2) \
        * jnp.maximum(W_R - W, 0.0)
    C_rate = C2_CREEP * A_SOFTNESS * (P_o - P) ** 3 * W

    # pressure update (calc_P_next; no-sliding closure for W=0)
    Z = C_rate - O_rate + q_water / dt
    P_new = P + dt * (RHO_W * grav / PHI_ENGLACIAL) * (-divQ + Z)
    P_new = jnp.clip(P_new, 0.0, P_o)
    floating_or_dry = ~mask_gr
    P_new = jnp.where(floating_or_dry | ((W <= 0.0) & mask_gr),
                      P_o, P_new)
    P_new = jnp.where(Hi <= 0.0, 0.0, P_new)

    # layer thickness updates (calc_W_water_W_til_next)
    W_new = jnp.where(mask_gr,
                      jnp.clip(W + q_water - dt * divQ, 0.0, W_MAX), 0.0)
    W_til_new = jnp.where(mask_gr,
                          jnp.clip(W_til + q_til, 0.0, W_MAX_TIL), 0.0)
    return Salle2025State(W=W_new, W_til=W_til_new, P=P_new), dt


def run_salle2025_leg(C, md, h, Hi, Hb, mask_grounded_ice,
                      u_base, v_base, max_substeps=2000):
    """Integrate the hydrology to `basal_hydro_equil_time` model-years in
    adaptive sub-steps under one lax.while_loop (basal_hydrology_leg).

    u_base/v_base on the a-grid in m/yr (converted to SI inside).
    Returns (state, till effective pressure N_til [Pa],
    till yield stress tau_c [Pa])."""
    mask_b = mask_grounded_ice[md.Tri].any(axis=1)
    u_si = u_base / sec_per_year
    v_si = v_base / sec_per_year
    t_goal = C.basal_hydro_equil_time * sec_per_year
    dt_max = jnp.asarray(C.dt_ice_max * sec_per_year, md.A.dtype)

    def cond(carry):
        h_c, t, it = carry
        return (t < t_goal) & (it < max_substeps)

    def body(carry):
        h_c, t, it = carry
        h_n, dt = _hydro_step(md, h_c, Hi, Hb, mask_grounded_ice, mask_b,
                              u_si, v_si, jnp.minimum(dt_max, t_goal - t))
        return (h_n, t + dt, it + 1)

    h_out, _, _ = lax.while_loop(
        cond, body, (h, jnp.asarray(0.0, md.A.dtype), jnp.int32(0)))

    N_til, tau_c = salle2025_till_outputs(h_out, Hi)
    return h_out, N_til, tau_c


def salle2025_till_outputs(h, Hi):
    """Till effective pressure (Bueler & Van Pelt 2015 Eq. 23, with the
    water-layer pressure correction, calc_N_til) and yield stress
    (calc_yield_stress)."""
    P_o = ice_density * grav * Hi
    s = h.W_til / W_MAX_TIL
    N_til = jnp.minimum(
        P_o, N0_TILL * (DELTA_TILL * P_o / N0_TILL) ** s
        * 10.0 ** (E0_TILL / CC_TILL * (1.0 - s)))
    N_til = N_til - RHO_W * grav * h.W
    tau_c = jnp.tan(PHI_TILL_DEG * pi / 180.0) * N_til
    return N_til, tau_c
