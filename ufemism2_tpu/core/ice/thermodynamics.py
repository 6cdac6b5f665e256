"""3-D thermodynamics: englacial heat equation on the zeta grid.

Re-design of src/UFEMISM/thermodynamics/: the per-vertex implicit vertical
solves with per-vertex time-step halving
(thermodynamics_3D_heat_equation.f90:34-50) become fully batched
tridiagonal solves over all columns at once (ops/tridiag.py), with the
halving retry vectorised: solutions are computed for dt, dt/2 x2, dt/4 x4,
... levels and each vertex selects its first stable level; still-unstable
columns fall back to the Robin (1955) analytical profile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mesh_data import MeshData, EField, EIndex, map_b_to_c
from ...utils.constants import (ice_density, seawater_density, grav, T0,
                                Clausius_Clapeyron_gradient, sec_per_year, pi)
from ...ops.tridiag import thomas_batched, zeta_tridiag_operators


def register_thermo_static(md: MeshData):
    """Static per-vertex upwind-sector tables (host build, numpy).

    The upwind-triangle search of calc_upwind_heat_flux needs, per
    (vertex, neighbour-sector c): the sector edge vectors vi->C[c] and
    vi->C[c+1], whether the wrap sector exists, and the triangle spanned
    by (vi, C[c], C[c+1]) (= the triangle left of the directed edge
    vi->C[c], via VE/EV/ETri). All of that is mesh connectivity, so it
    is precomputed here as extras - which also makes the runtime lookup
    a single ext_Tri gather that works unchanged under shard_map (the
    EV/ETri double-hop used before cannot be re-indexed across shards).
    """
    if md.extras is None or "th_ab_x" in md.extras:
        return
    import numpy as np
    V = np.asarray(md.V)
    C = np.asarray(md.C)
    mask_C = np.asarray(md.mask_C)
    VBI = np.asarray(md.VBI)
    VE = np.asarray(md.VE)
    EV = np.asarray(md.EV)
    ETri = np.asarray(md.ETri)
    nV, K = C.shape
    Cp = np.where(mask_C, C, 0)
    ab_x = np.where(mask_C, V[Cp, 0] - V[:, 0:1], 0.0)
    ab_y = np.where(mask_C, V[Cp, 1] - V[:, 1:2], 0.0)
    nC = mask_C.sum(axis=1)
    ks = np.arange(K)[None, :]
    nxt = np.where(ks + 1 < nC[:, None], ks + 1, 0)
    ac_x = np.take_along_axis(ab_x, nxt, axis=1)
    ac_y = np.take_along_axis(ab_y, nxt, axis=1)
    interior = (VBI == 0)[:, None]
    has_wrap = interior | (ks + 1 < nC[:, None])
    e = VE
    canon_first = EV[e, 0] == np.arange(nV)[:, None]
    tri_left = np.where(canon_first, ETri[e, 0], ETri[e, 1])
    tri_sector = np.maximum(tri_left, 0)
    dt = np.asarray(md.A).dtype
    md.extras.update({
        "th_ab_x": EField(jnp.asarray(ab_x, dt), "V"),
        "th_ab_y": EField(jnp.asarray(ab_y, dt), "V"),
        "th_ac_x": EField(jnp.asarray(ac_x, dt), "V"),
        "th_ac_y": EField(jnp.asarray(ac_y, dt), "V"),
        "th_has_wrap": EField(jnp.asarray(has_wrap), "V"),
        "th_tri_sector": EIndex(jnp.asarray(tri_sector), "V", "Tri"),
    })


# -- material properties (thermodynamics_utilities.f90) ----------------------

def calc_heat_capacity(C, Ti):
    if C.choice_ice_heat_capacity == "uniform":
        return jnp.full_like(Ti, C.uniform_ice_heat_capacity)
    if C.choice_ice_heat_capacity == "Pounder1965":
        return 2115.3 + 7.79293 * (Ti - T0)
    raise ValueError(f"unknown choice_ice_heat_capacity "
                     f"'{C.choice_ice_heat_capacity}'")


def calc_thermal_conductivity(C, Ti):
    if C.choice_ice_thermal_conductivity == "uniform":
        return jnp.full_like(Ti, C.uniform_ice_thermal_conductivity)
    if C.choice_ice_thermal_conductivity == "Ritz1987":
        return 3.101e8 * jnp.exp(-0.0057 * Ti)
    raise ValueError(f"unknown choice_ice_thermal_conductivity "
                     f"'{C.choice_ice_thermal_conductivity}'")


def calc_pressure_melting_point(md, Hi_eff):
    """Ti_pmp[vi,k] = T0 - CC * Hi_eff * zeta (Huybrechts 1992)."""
    return T0 - Clausius_Clapeyron_gradient * Hi_eff[:, None] \
        * md.zeta[None, :]


def calc_zeta_gradients(md: MeshData, Hi, Hs, dHi_dt, dHs_dt):
    """dzeta/dx, dy, dz, dt on the a-grid x nz (zeta_gradients.f90)."""
    Hi_r = jnp.maximum(Hi, 0.1)
    dHi_dx = md.M_ddx_a_a @ Hi
    dHi_dy = md.M_ddy_a_a @ Hi
    dHs_dx = md.M_ddx_a_a @ Hs
    dHs_dy = md.M_ddy_a_a @ Hs
    z = md.zeta[None, :]
    inv_H = (1.0 / Hi_r)[:, None]
    dzeta_dx = inv_H * (dHs_dx[:, None] - z * dHi_dx[:, None])
    dzeta_dy = inv_H * (dHs_dy[:, None] - z * dHi_dy[:, None])
    dzeta_dz = -inv_H * jnp.ones_like(z)
    dzeta_dt = inv_H * (dHs_dt[:, None] - z * dHi_dt[:, None])
    return dzeta_dx, dzeta_dy, dzeta_dz, dzeta_dt


# -- heating terms -----------------------------------------------------------

def calc_strain_heating(C, md: MeshData, masks, A_flow, u_3D_b, v_3D_b, w_3D):
    """Internal (strain) heating Phi [J kg^-1 yr^-1]
    (thermodynamics_utilities.f90:60-84)."""
    n = C.Glens_flow_law_exponent
    du_dx = md.M_ddx_b_a @ u_3D_b
    du_dy = md.M_ddy_b_a @ u_3D_b
    dv_dx = md.M_ddx_b_a @ v_3D_b
    dv_dy = md.M_ddy_b_a @ v_3D_b
    dw_dx = md.M_ddx_a_a @ w_3D
    dw_dy = md.M_ddy_a_a @ w_3D
    # vertical gradients via simple zeta differences
    dz = jnp.gradient(md.zeta)
    du_dz = jnp.gradient(md.M_map_b_a @ u_3D_b, axis=1) / dz[None, :]
    dv_dz = jnp.gradient(md.M_map_b_a @ v_3D_b, axis=1) / dz[None, :]
    dw_dz = jnp.gradient(w_3D, axis=1) / dz[None, :]
    D = jnp.sqrt(0.5 * (du_dx ** 2 + dv_dy ** 2 + dw_dz ** 2
                        + 0.5 * (du_dy + dv_dx) ** 2
                        + 0.5 * (du_dz + dw_dx) ** 2
                        + 0.5 * (dv_dz + dw_dy) ** 2))
    Phi = 2.0 * A_flow ** (-1.0 / n) * D ** (1.0 / n + 1.0)
    has_ice = (masks["mask_grounded_ice"] | masks["mask_floating_ice"])
    return jnp.where(has_ice[:, None], Phi, 0.0)


def calc_frictional_heating(masks, beta_a, uabs_base_a):
    """Frictional heating at the grounded base [J m^-2 yr^-1]."""
    return jnp.where(masks["mask_grounded_ice"], beta_a * uabs_base_a ** 2,
                     0.0)


# -- vertical velocities (vertical_velocities.f90:23) ------------------------

def calc_vertical_velocities(C, md: MeshData, masks, Hi, Hib, dHi_dt, dHb_dt,
                             u_3D_b, v_3D_b, u_3D_a, v_3D_a,
                             dzeta_dx, dzeta_dy, dzeta_dz, BMB):
    nz = md.nz
    dHib_dx = md.M_ddx_a_a @ Hib
    dHib_dy = md.M_ddy_a_a @ Hib
    dHib_dt = jnp.where(masks["mask_grounded_ice"], dHb_dt,
                        jnp.where(masks["mask_floating_ice"],
                                  -dHi_dt * ice_density / seawater_density,
                                  0.0))
    # basal w
    w_base = (u_3D_a[:, nz - 1] * dHib_dx + v_3D_a[:, nz - 1] * dHib_dy
              + dHib_dt + jnp.minimum(0.0, BMB))

    # u,v on edges, horizontal divergence via Voronoi boundary loop integral
    u_c = map_b_to_c(md, u_3D_b)       # [nE, nz]
    v_c = map_b_to_c(md, v_3D_b)
    u_e = md.ext_E(u_c)[md.VE]         # [nV, K, nz]
    v_e = md.ext_E(v_c)[md.VE]
    nhat_x = (md.D_x / md.D)[..., None]
    nhat_y = (md.D_y / md.D)[..., None]
    dS = md.Cw[..., None]
    un_dS = jnp.where(md.mask_C[..., None],
                      (u_e * nhat_x + v_e * nhat_y) * dS, 0.0)
    cint = un_dS.sum(axis=1)           # [nV, nz]
    # staggered means between layers
    cint_s = 0.5 * (cint[:, 1:] + cint[:, :-1])
    grad_uv = cint_s / md.A[:, None]

    dzeta = (md.zeta[1:] - md.zeta[:-1])[None, :]
    du_dzeta = (u_3D_a[:, 1:] - u_3D_a[:, :-1]) / dzeta
    dv_dzeta = (v_3D_a[:, 1:] - v_3D_a[:, :-1]) / dzeta
    zx_s = 0.5 * (dzeta_dx[:, 1:] + dzeta_dx[:, :-1])
    zy_s = 0.5 * (dzeta_dy[:, 1:] + dzeta_dy[:, :-1])
    zz_s = 0.5 * (dzeta_dz[:, 1:] + dzeta_dz[:, :-1])
    dw_dzeta = -1.0 / zz_s * (grad_uv + zx_s * du_dzeta + zy_s * dv_dzeta)

    # integrate upward from the base: w[ks] = w[ks+1] - dzeta * dw_dzeta[ks]
    incr = (dzeta * dw_dzeta)[:, ::-1]          # from base upward
    w_rev = w_base[:, None] - jnp.concatenate(
        [jnp.zeros_like(w_base)[:, None], jnp.cumsum(incr, axis=1)], axis=1)
    w = w_rev[:, ::-1]

    has_ice = masks["mask_grounded_ice"] | masks["mask_floating_ice"]
    w = jnp.where(has_ice[:, None], w, 0.0)
    # thin ice: horizontal stretching negligible
    w = jnp.where((Hi < 10.0)[:, None], w_base[:, None], w)
    w = jnp.where(has_ice[:, None], w, 0.0)
    return w


# -- upwind horizontal advection (thermodynamics_utilities.f90:352) ----------

def calc_upwind_heat_flux(md: MeshData, Hi, Ti, u_3D_b, v_3D_b,
                          u_vav_a, v_vav_a):
    """u*dT/dx, v*dT/dy taken from the upwind triangle.

    The upwind triangle is the surrounding triangle whose angular sector
    contains the upwind vector -u_vav; the per-(vertex, sector) geometry
    and triangle table are static mesh connectivity precomputed by
    register_thermo_static (shard-compatible: the runtime is one
    ext_Tri halo gather)."""
    dT_dx_b = md.M_ddx_a_b @ Ti         # [nTri, nz]
    dT_dy_b = md.M_ddy_a_b @ Ti

    ab_x, ab_y = md.x("th_ab_x"), md.x("th_ab_y")
    ac_x, ac_y = md.x("th_ac_x"), md.x("th_ac_y")
    has_wrap = md.x("th_has_wrap")
    ux = -u_vav_a[:, None]
    uy = -v_vav_a[:, None]
    cross_ab_u = ab_x * uy - ab_y * ux
    cross_u_ac = ux * ac_y - uy * ac_x
    sector = (cross_ab_u >= 0) & (cross_u_ac >= 0) & md.mask_C & has_wrap
    # first matching sector (fall back to 0)
    idx = jnp.argmax(sector, axis=1)
    ti_upwind = jnp.take_along_axis(md.x("th_tri_sector"),
                                    idx[:, None], axis=1)[:, 0]

    u_up = md.ext_Tri(u_3D_b)[ti_upwind]           # [nV, nz]
    v_up = md.ext_Tri(v_3D_b)[ti_upwind]
    ud = u_up * md.ext_Tri(dT_dx_b)[ti_upwind]
    vd = v_up * md.ext_Tri(dT_dy_b)[ti_upwind]
    thin = Hi < 1.0
    return (jnp.where(thin[:, None], 0.0, ud),
            jnp.where(thin[:, None], 0.0, vd))


# -- Robin analytical solution (thermodynamics_utilities.f90:269) ------------

def robin_solution(C, md, Hi_eff, Ti_pmp, masks, T_surf, SMB, geothermal):
    k0, ke, c0 = 9.828, 0.0057, 2127.5
    cond = k0 * sec_per_year * jnp.exp(-ke * T0)
    diff = cond / (ice_density * c0)
    dTdz_base = -geothermal / cond
    Ts = jnp.minimum(T0, T_surf)

    zeta = md.zeta[None, :]
    H = Hi_eff[:, None]
    SMBp = jnp.maximum(SMB, 1e-6)[:, None]
    ell = jnp.sqrt(2.0 * diff * H / SMBp)
    dist = (1.0 - zeta) * H
    erf1 = jax.scipy.special.erf(dist / ell)
    erf2 = jax.scipy.special.erf(H / ell)
    Ti_acc = Ts[:, None] + jnp.sqrt(pi) / 2.0 * ell \
        * dTdz_base[:, None] * (erf1 - erf2)
    Ti_abl = Ts[:, None] + ((T0 - Clausius_Clapeyron_gradient * H)
                            - Ts[:, None]) * zeta
    Ti_flt = Ts[:, None] + zeta * (Ti_pmp[:, -1:] - Ts[:, None])

    Ti = jnp.where(masks["mask_grounded_ice"][:, None],
                   jnp.where((SMB > 0)[:, None], Ti_acc, Ti_abl),
                   jnp.where(masks["mask_floating_ice"][:, None],
                             Ti_flt, Ts[:, None] * jnp.ones_like(zeta)))
    Ti = jnp.where((Hi_eff > C.Hi_min_thermo)[:, None], Ti,
                   Ts[:, None] * jnp.ones_like(zeta))
    return jnp.minimum(Ti, Ti_pmp)


# -- the batched heat-equation solve -----------------------------------------

def make_heat_solver(C, md: MeshData):
    """Build solve_3D_heat_equation(state-like fields, dt) -> Ti_new."""
    zops = zeta_tridiag_operators(md.zeta)
    l1, d1, u1 = [jnp.asarray(a) for a in zops["ddzeta"]]
    l2, d2, u2 = [jnp.asarray(a) for a in zops["d2dzeta2"]]
    nz = md.nz
    dz_base = md.zeta[nz - 1] - md.zeta[nz - 2]

    def solve_columns(Ti, coef_ddzeta, coef_d2dzeta2, rhs_interior,
                      T_surf_bc, base_is_flux, Q_base, T_base, Ti_pmp, dt,
                      dzz_base, Ki_base):
        """One implicit vertical solve for all columns [nV, nz]."""
        ldiag = (coef_ddzeta[:, 1:] * l1[None, :]
                 + coef_d2dzeta2[:, 1:] * l2[None, :])
        diag = (1.0 / dt + coef_ddzeta * d1[None, :]
                + coef_d2dzeta2 * d2[None, :])
        udiag = (coef_ddzeta[:, :-1] * u1[None, :]
                 + coef_d2dzeta2[:, :-1] * u2[None, :])
        b = rhs_interior + Ti / dt

        # surface BC row: T = min(T_surf, T0)
        diag = diag.at[:, 0].set(1.0)
        udiag = udiag.at[:, 0].set(0.0)
        b = b.at[:, 0].set(jnp.minimum(T_surf_bc, T0))
        # basal BC row
        T_base_grnd = jnp.minimum(
            Ti_pmp[:, nz - 1],
            Ti[:, nz - 2] - dz_base * Q_base / (dzz_base * Ki_base))
        T_base_bc = jnp.where(base_is_flux, T_base_grnd,
                              jnp.minimum(T_base, Ti_pmp[:, nz - 1]))
        diag = diag.at[:, nz - 1].set(1.0)
        ldiag = ldiag.at[:, nz - 2].set(0.0)
        b = b.at[:, nz - 1].set(T_base_bc)
        return thomas_batched(ldiag, diag, udiag, b)

    def solve(Ti, u_3D_a, v_3D_a, w_3D, u_dTdx_up, v_dTdy_up, T_surf,
              Ti_pmp, Ki, Cpi, dzx, dzy, dzz, dzt, Phi,
              Q_base_grnd, T_base_float, masks, fraction_gr, Hi_eff, dt,
              SMB, geothermal):
        c_ddzeta = dzt + u_3D_a * dzx + v_3D_a * dzy + w_3D * dzz
        c_d2dzeta2 = -Ki / (ice_density * Cpi) * dzz ** 2
        rhs = -u_dTdx_up - v_dTdy_up + Phi / (ice_density * Cpi)

        dzz_base = dzz[:, nz - 1]
        Ki_base = Ki[:, nz - 1]

        grounded = masks["mask_grounded_ice"]
        floating = masks["mask_floating_ice"]
        gl_gr = masks["mask_gl_gr"]

        def one_solve(Ti_in, dt_i):
            T_g = solve_columns(Ti_in, c_ddzeta, c_d2dzeta2, rhs, T_surf,
                                jnp.asarray(True), Q_base_grnd,
                                T_base_float, Ti_pmp, dt_i,
                                dzz_base, Ki_base)
            T_f = solve_columns(Ti_in, c_ddzeta, c_d2dzeta2, rhs, T_surf,
                                jnp.asarray(False), Q_base_grnd,
                                T_base_float, Ti_pmp, dt_i,
                                dzz_base, Ki_base)
            if C.choice_GL_temperature_BC == "grounded":
                T_gl = T_g
            elif C.choice_GL_temperature_BC == "pmp":
                T_gl = T_f
            else:  # subgrid
                T_gl = fraction_gr[:, None] * T_g \
                    + (1 - fraction_gr[:, None]) * T_f
            T = jnp.where(gl_gr[:, None], T_gl,
                          jnp.where(grounded[:, None], T_g,
                                    jnp.where(floating[:, None], T_f, T_g)))
            return T

        def substep_solution(n_sub, dt_i):
            T = Ti
            for _ in range(n_sub):
                T = one_solve(T, dt_i)
            return T

        # stability ladder: dt, dt/2 x2, dt/4 x4, dt/8 x8, dt/16 x16
        candidates = [substep_solution(2 ** lev, dt * 0.5 ** lev)
                      for lev in range(5)]

        def stable(T):
            return (jnp.isfinite(T) & (T >= 180.0) & (T <= T0)).all(axis=1)

        T_out = candidates[-1]
        ok = stable(candidates[-1])
        for T_cand in reversed(candidates[:-1]):
            s = stable(T_cand)
            T_out = jnp.where(s[:, None], T_cand, T_out)
            ok = ok | s

        # unstable columns -> Robin solution
        T_robin = robin_solution(C, md, Hi_eff, Ti_pmp, masks, T_surf,
                                 SMB, geothermal)
        T_out = jnp.where(ok[:, None], T_out, T_robin)

        # very thin ice: profile = surface temperature
        thin = Hi_eff < C.Hi_min_thermo
        T_out = jnp.where(thin[:, None], T_surf[:, None], T_out)
        # cap at pressure melting point
        T_out = jnp.minimum(T_out, Ti_pmp)
        n_unstable = (~ok & ~thin).sum()
        return T_out, n_unstable

    return solve


def make_geothermal_flux(C, md: MeshData):
    # uniform value is already [J m^-2 yr^-1] (Sclater et al. 1980 default);
    # only read_from_file fields come in J m^-2 s^-1 and need conversion
    # (geothermal_heat_flux.f90:50-61: read 'hflux' [W m^-2], remap to
    # the mesh, multiply by sec_per_year)
    if C.choice_geothermal_heat_flux == "uniform":
        ghf = jnp.full(md.nV, C.uniform_geothermal_heat_flux)
    elif C.choice_geothermal_heat_flux == "read_from_file":
        from ...io.input_files import read_field_from_file_2D
        from ...utils.constants import sec_per_year as _spy
        mesh = md._host_mesh
        ghf = jnp.asarray(read_field_from_file_2D(
            C.filename_geothermal_heat_flux, "hflux", mesh),
            md.A.dtype) * _spy
    else:
        raise ValueError("unknown choice_geothermal_heat_flux "
                         f"'{C.choice_geothermal_heat_flux}'")
    # registered as an extra so the sharded thermodynamics step finds
    # its per-device slice through the generic extras distribution
    if md.extras is not None:
        md.extras["geothermal"] = EField(ghf, "V")
    return ghf


def run_thermodynamics(C, md: MeshData, s, dt, T_surf_annual, SMB, BMB,
                       heat_solver, geothermal=None):
    """One thermodynamics step: returns updated Ti (thermodynamics_main).
    `geothermal` defaults to the md-registered field (required under
    shard_map, where the closure constant would be the full-mesh array)."""
    from .masks import determine_masks
    from .subgrid import calc_grounded_fractions_bilin_TAF

    if geothermal is None or md.extras and "geothermal" in md.extras:
        geothermal = md.x("geothermal")

    masks = determine_masks(md, s.Hi, s.Hb, s.SL)
    fraction_gr = calc_grounded_fractions_bilin_TAF(
        md, s.Hi, s.Hb, s.SL, masks["mask_floating_ice"])

    Ti = s.Ti
    Cpi = calc_heat_capacity(C, Ti)
    Ki = calc_thermal_conductivity(C, Ti)
    Hi_eff = s.Hi_eff
    Ti_pmp = calc_pressure_melting_point(md, Hi_eff)

    dHs_dt = s.dHi_dt  # dHs/dt ~ dHi/dt over rigid bed (GIA adds dHb_dt)
    dzx, dzy, dzz, dzt = calc_zeta_gradients(md, s.Hi, s.Hs, s.dHi_dt, dHs_dt)

    u_3D_a = md.M_map_b_a @ s.u_3D_b
    v_3D_a = md.M_map_b_a @ s.v_3D_b
    u_vav_a = md.M_map_b_a @ s.u_vav_b
    v_vav_a = md.M_map_b_a @ s.v_vav_b

    w_3D = calc_vertical_velocities(
        C, md, masks, s.Hi, s.Hib, s.dHi_dt, jnp.zeros_like(s.Hi),
        s.u_3D_b, s.v_3D_b, u_3D_a, v_3D_a, dzx, dzy, dzz, BMB)

    u_dTdx_up, v_dTdy_up = calc_upwind_heat_flux(
        md, s.Hi, Ti, s.u_3D_b, s.v_3D_b, u_vav_a, v_vav_a)

    Phi = calc_strain_heating(C, md, masks, s.A_flow, s.u_3D_b, s.v_3D_b,
                              w_3D)
    uabs_base = jnp.sqrt(u_3D_a[:, -1] ** 2 + v_3D_a[:, -1] ** 2)
    beta_a = jnp.zeros_like(s.Hi)  # frictional heating uses sliding beta
    fric = calc_frictional_heating(masks, beta_a, uabs_base)
    Q_base_grnd = fric + geothermal
    T_base_float = Ti_pmp[:, -1]

    Ti_new, n_unstable = heat_solver(
        Ti, u_3D_a, v_3D_a, w_3D, u_dTdx_up, v_dTdy_up, T_surf_annual,
        Ti_pmp, Ki, Cpi, dzx, dzy, dzz, dzt, Phi,
        Q_base_grnd, T_base_float, masks, fraction_gr, Hi_eff, dt,
        SMB, geothermal)
    # keep the run dtype: f64 constants inside the heating/conductivity
    # terms must not promote the f32 (tpu perf mode) Ti carry
    return Ti_new.astype(Ti.dtype), n_unstable
