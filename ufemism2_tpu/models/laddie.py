"""LADDIE: one-layer ocean boundary-layer (ice-shelf melt) plume model.

TPU-native re-design of src/LADDIE/ (Lambert et al. 2023): depth-integrated
plume (H, U, V, T, S) under the ice shelf, integrated in pseudo-time with
the 3-stage forward-backward Runge-Kutta scheme (laddie_integration.f90:72,
Lilly et al. 2023) to quasi-steady state each coupling interval. All fields
live on the full mesh gated by the shelf masks (mask-gated dense arrays
instead of the reference's repartitioned shelf-only subdomain - the
TPU-friendly equivalent of its load-balanced repartitioning). The whole
pseudo-time leg runs as one jitted lax.fori_loop.

Physics: 3-equation melt with u*-dependent gamma (laddie_physics.f90:27),
Gaspar (1988) entrainment, linear EOS buoyancy, upstream momentum and
tracer advection (laddie_velocity.f90:282, laddie_tracers.f90), Voronoi
upwind thickness divergence (laddie_thickness.f90:143).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import (grav, seawater_density, cp_ice, cp_ocean,
                               L_fusion, freezing_lambda_1, freezing_lambda_2,
                               freezing_lambda_3, Prandtl_number,
                               Schmidt_number, sec_per_year)
from ..core.mesh_data import MeshData, map_b_to_c


class LaddieState(NamedTuple):
    H: jnp.ndarray     # [nV] layer thickness [m]
    U: jnp.ndarray     # [nTri] velocity [m/s]
    V: jnp.ndarray
    T: jnp.ndarray     # [nV] temperature [deg C]
    S: jnp.ndarray     # [nV] salinity [PSU]


class LaddieMasks(NamedTuple):
    a: jnp.ndarray       # [nV] shelf (active) vertices
    gr_a: jnp.ndarray    # [nV] grounded
    oc_a: jnp.ndarray    # [nV] ice-free ocean
    b: jnp.ndarray       # [nTri] active triangles
    gl_b: jnp.ndarray    # [nTri] grounding-line triangles
    cf_b: jnp.ndarray    # [nTri] calving-front triangles


def laddie_masks(md: MeshData, masks):
    """Derive LADDIE masks from the ice masks (laddie_main_utils)."""
    a = masks["mask_floating_ice"]
    gr_a = masks["mask_grounded_ice"] | masks["mask_icefree_land"]
    oc_a = masks["mask_icefree_ocean"]
    tri_a = a[md.Tri]            # [nTri,3]
    tri_gr = gr_a[md.Tri]
    tri_oc = oc_a[md.Tri]
    b = tri_a.any(axis=1) & ~tri_gr.all(axis=1) & ~tri_oc.all(axis=1)
    gl_b = b & tri_gr.any(axis=1)
    cf_b = b & tri_oc.any(axis=1)
    return LaddieMasks(a=a, gr_a=gr_a, oc_a=oc_a, b=b, gl_b=gl_b, cf_b=cf_b)


def make_calc_SGD(C, md: MeshData):
    """Subglacial discharge source [m s^-1] on the a-grid, or None when
    choice_laddie_SGD = 'none'.

    Reference semantics (LADDIE_main_model.f90:130-146,
    laddie_physics.f90:182-386, masks_mod.f90:504-605,
    laddie_hydrology.f90):
      'idealised'      - flux spread over floating-GL vertices inside a
                         5 km y-band on the MISMIP+ channel (PC/PW/PE);
      'read_from_file' - same, mask read from a 2-D file (>0 = channel);
      'read_transects' - per-transect flux injected at the FIRST transect
                         vertex on the floating grounding line, either
                         into that single cell or distributed over it and
                         up to two floating-GL neighbours.
    The flux only applies from start_time_of_applying_SGD onward (the
    transect variant has no time gate in the reference).

    Returns calc(mask_a, mask_gl_fl, time[yr]) -> SGD [m s^-1].
    """
    choice = getattr(C, "choice_laddie_SGD", "none")
    if choice == "none":
        return None
    import numpy as np
    mesh = md._host_mesh
    A = jnp.asarray(mesh.A, md.A.dtype)
    t_start = C.start_time_of_applying_SGD

    if choice in ("idealised", "read_from_file"):
        if choice == "idealised":
            y0 = {"MISMIPplus_PC": 0.0, "MISMIPplus_PW": 18e3,
                  "MISMIPplus_PE": -18e3}[C.choice_laddie_SGD_idealised]
            m_np = ((mesh.V[:, 1] > y0 - 2500.0)
                    & (mesh.V[:, 1] < y0 + 2500.0))
        else:
            from ..io.input_files import read_field_from_file_2D
            m_np = np.asarray(read_field_from_file_2D(
                C.filename_laddie_mask_SGD, "mask_SGD", mesh)) > 0.0
        mask_SGD = jnp.asarray(m_np)
        flux = C.laddie_SGD_flux

        def calc(mask_a, mask_gl_fl, time):
            cond = mask_a & mask_gl_fl & mask_SGD
            area = jnp.sum(jnp.where(cond, A, 0.0))
            sgd = jnp.where(cond, flux / jnp.maximum(area, 1e-30), 0.0)
            on = jnp.asarray(time >= t_start) & (area > 0.0)
            return jnp.where(on, sgd, 0.0)
        return calc

    if choice == "read_transects":
        from scipy.spatial import cKDTree
        from .transects import parse_transect_str, resample_waypoints
        tree = cKDTree(mesh.V)
        transects = []
        for ts in (t.strip() for t in C.transects_SGD.split("||")
                   if t.strip()):
            # reference strings use ',SF=<flux>' instead of ',dx='
            i = ts.find(",SF=")
            if i < 0:
                raise ValueError(f"invalid SGD transect '{ts}': no SF=")
            sf = float(ts[i + 4:])
            src, name, fname, _ = parse_transect_str(ts[:i] + ",dx=100")
            if src != "read_from_file":
                raise ValueError("SGD transects must be 'file:...' "
                                 "(laddie_hydrology.f90:92)")
            wp = np.atleast_2d(np.loadtxt(
                fname, comments=("!", "#", "&", "/")))[:, :2]
            pts = resample_waypoints(wp, 100.0)
            idx = tree.query(pts)[1]            # containing-vertex proxy
            transects.append((jnp.asarray(idx), sf))
        nbr = jnp.asarray(mesh.C)                # [nV, nC_mem], -1 pad
        nbr_ok = jnp.asarray(mesh.C >= 0)
        single = C.distribute_SGD == "single_cell"

        def calc(mask_a, mask_gl_fl, time):
            sgd = jnp.zeros(md.nV, md.A.dtype)
            gl = mask_a & mask_gl_fl
            for idx, sf in transects:
                hits = gl[idx]
                has = hits.any()
                vi = idx[jnp.argmax(hits)]
                if single:
                    add = sf / A[vi]
                    sgd = sgd.at[vi].add(jnp.where(has, add, 0.0))
                else:
                    # up to two floating-GL neighbours, in C order
                    nb = nbr[vi]
                    fl = gl[jnp.maximum(nb, 0)] & nbr_ok[vi]
                    take = fl & (jnp.cumsum(fl.astype(jnp.int32)) <= 2)
                    area = A[vi] + jnp.sum(
                        jnp.where(take, A[jnp.maximum(nb, 0)], 0.0))
                    w = jnp.where(has, sf / area, 0.0)
                    sgd = sgd.at[vi].add(w)
                    sgd = sgd.at[jnp.maximum(nb, 0)].add(
                        jnp.where(take, w, 0.0))
            return sgd
        return calc

    raise ValueError(f"unknown choice_laddie_SGD '{choice}'")


def make_laddie_step(C, md: MeshData):
    """Build one pseudo-time fbrk3/euler step:
    step(state, lm, forcing) -> (state, diag) with melt in diag."""
    dt = C.dt_laddie            # [s]
    scheme = C.choice_laddie_integration_scheme or "fbrk3"
    if scheme not in ("fbrk3", "euler", "lfra"):
        raise ValueError(
            f"unknown choice_laddie_integration_scheme '{scheme}'")
    alpha = C.uniform_laddie_eos_linear_alpha
    beta_eos = C.uniform_laddie_eos_linear_beta
    fcor = C.uniform_laddie_coriolis_parameter
    Ctil = cp_ice / cp_ocean

    def ambient_TS(forcing, H):
        """Ambient T,S at the layer base via depth interpolation."""
        depths = forcing["z_ocean"]                  # [nd] positive down
        depth = jnp.maximum(0.0, H - forcing["Hib"])  # depth below draft
        depth_abs = jnp.maximum(0.0, -(forcing["Hib"] - H))
        nd = depths.shape[0]
        idx = jnp.clip(jnp.searchsorted(depths, depth_abs) - 1, 0, nd - 2)
        w = jnp.clip((depth_abs - depths[idx])
                     / jnp.maximum(depths[idx + 1] - depths[idx], 1e-9),
                     0.0, 1.0)
        ar = jnp.arange(H.shape[0])
        T_amb = forcing["T_ocean"][ar, idx] * (1 - w) \
            + forcing["T_ocean"][ar, idx + 1] * w
        S_amb = forcing["S_ocean"][ar, idx] * (1 - w) \
            + forcing["S_ocean"][ar, idx + 1] * w
        return T_amb, S_amb

    def physics(npx, lm: LaddieMasks, forcing, Hstar, use_Ti):
        """Melt, entrainment, buoyancy (laddie_physics.f90)."""
        U_a = md.M_map_b_a @ npx.U
        V_a = md.M_map_b_a @ npx.V
        u_star = jnp.sqrt(C.laddie_drag_coefficient_top
                          * (U_a ** 2 + V_a ** 2
                             + C.uniform_laddie_tidal_velocity ** 2))
        if C.choice_laddie_gamma == "Jenkins1991":
            nu0, eps = 1.95e-6, 1e-12
            AA = 2.12 * jnp.log(u_star * Hstar / nu0 + eps)
            gamma_T = u_star / (AA + 12.5 * Prandtl_number ** (2 / 3) - 8.68)
            gamma_S = u_star / (AA + 12.5 * Schmidt_number ** (2 / 3) - 8.68)
        else:
            gamma_T = u_star * C.uniform_laddie_gamma_T
            gamma_S = u_star * C.uniform_laddie_gamma_T / 35.0

        That = freezing_lambda_2 + freezing_lambda_3 * forcing["Hib"]
        Chat = jnp.where(use_Ti,
                         cp_ocean / (L_fusion - cp_ice * forcing["Ti_base"]),
                         cp_ocean / L_fusion)
        Bval = Chat * gamma_T * (That - npx.T) + gamma_S * (
            1 + Chat * Ctil * (That + freezing_lambda_1 * npx.S))
        Cval = Chat * gamma_T * gamma_S * (That - npx.T
                                           + freezing_lambda_1 * npx.S)
        disc = Bval ** 2 - 4 * Cval
        melt = jnp.where(disc < 0, 0.0,
                         0.5 * (-Bval + jnp.sqrt(jnp.maximum(disc, 0.0))))

        Dval = melt * cp_ice - cp_ocean * gamma_T
        T_freeze = (freezing_lambda_1 * npx.S + freezing_lambda_2
                    + freezing_lambda_3 * forcing["Hib"])
        L_eff = jnp.where(use_Ti, L_fusion - cp_ice * forcing["Ti_base"],
                          L_fusion)
        T_base = jnp.where(
            jnp.abs(Dval) < 1e-12, T_freeze,
            (melt * L_eff - cp_ocean * gamma_T * npx.T) / Dval)

        # ambient properties + buoyancy
        T_amb, S_amb = ambient_TS(forcing, Hstar)
        drho_amb = beta_eos * (S_amb - npx.S) - alpha * (T_amb - npx.T)
        drho_amb = jnp.maximum(drho_amb,
                               C.laddie_buoyancy_minimum / seawater_density)
        Hdrho_amb = Hstar * drho_amb

        # entrainment (Gaspar 1988)
        S_base = (T_base - freezing_lambda_2
                  - freezing_lambda_3 * forcing["Hib"]) / freezing_lambda_1
        drho_base = beta_eos * (npx.S - S_base) - alpha * (npx.T - T_base)
        entr = (2 * C.laddie_Gaspar1988_mu / grav * u_star ** 3
                / (jnp.maximum(Hstar, 1e-3) * drho_amb)
                - drho_base / drho_amb * melt)
        entr = jnp.maximum(entr, -1e-3)
        detr = -jnp.minimum(entr, 0.0)

        act = lm.a
        z = jnp.zeros_like(melt)
        return dict(melt=jnp.where(act, melt, 0.0),
                    entr=jnp.where(act, entr, 0.0),
                    detr=jnp.where(act, detr, 0.0),
                    gamma_T=jnp.where(act, gamma_T, 0.0),
                    gamma_S=jnp.where(act, gamma_S, 0.0),
                    T_base=jnp.where(act, T_base, 0.0),
                    T_amb=jnp.where(act, T_amb, 0.0),
                    S_amb=jnp.where(act, S_amb, 0.0),
                    drho_amb=jnp.where(act, drho_amb, 1e-6),
                    Hdrho_amb=jnp.where(act, Hdrho_amb, 0.0))

    def divQH(npx, lm: LaddieMasks):
        """Upwind Voronoi thickness divergence (laddie_thickness.f90:143)."""
        U_c = map_b_to_c(md, npx.U)
        V_c = map_b_to_c(md, npx.V)
        u_perp = U_c[md.VE] * md.D_x / md.D + V_c[md.VE] * md.D_y / md.D
        H_j = npx.H[md.C]
        nbr_gr = lm.gr_a[md.C]
        nbr_oc = lm.oc_a[md.C]
        LcA = md.Cw / md.A[:, None]
        flux_out = jnp.maximum(u_perp, 0.0) * npx.H[:, None]
        flux_in = jnp.minimum(u_perp, 0.0) * jnp.where(nbr_oc, 0.0, H_j)
        flux = jnp.where(md.mask_C & ~nbr_gr, LcA * (flux_out + flux_in), 0.0)
        return jnp.where(lm.a, flux.sum(axis=1), 0.0)

    # triangle-triangle geometry for momentum advection/viscosity
    mesh = md._host_mesh
    mask_TriC = mesh.TriC >= 0
    TriC = jnp.asarray(np.where(mask_TriC, mesh.TriC, 0), jnp.int32)
    mTriC = jnp.asarray(mask_TriC)
    TriD_x = jnp.asarray(np.where(
        mask_TriC, mesh.Tricc[np.maximum(mesh.TriC, 0), 0]
        - mesh.Tricc[:, 0:1], 1.0))
    TriD_y = jnp.asarray(np.where(
        mask_TriC, mesh.Tricc[np.maximum(mesh.TriC, 0), 1]
        - mesh.Tricc[:, 1:1 + 1], 1.0))
    TriD = jnp.sqrt(TriD_x ** 2 + TriD_y ** 2)
    TriD = jnp.where(TriD < 1e-6, 1.0, TriD)
    # edge length between triangles = shared Delaunay edge length
    TriCw = jnp.asarray(np.linalg.norm(
        mesh.V[mesh.EV[np.maximum(mesh.TriE, 0), 0]]
        - mesh.V[mesh.EV[np.maximum(mesh.TriE, 0), 1]], axis=2))
    TriA = md.TriA
    TriE_j = jnp.asarray(np.maximum(mesh.TriE, 0), jnp.int32)

    def divQUV_upstream(npx, lm: LaddieMasks, Hstar_b):
        """Upstream momentum advection (laddie_velocity.f90:282)."""
        U_c = map_b_to_c(md, npx.U)
        V_c = map_b_to_c(md, npx.V)
        u_perp = (U_c[TriE_j] * TriD_x / TriD
                  + V_c[TriE_j] * TriD_y / TriD)       # [nTri,3]
        gl_nbr = lm.gl_b[TriC]
        act = mTriC & ~gl_nbr
        out_flux = jnp.maximum(u_perp, 0.0)
        in_flux = jnp.minimum(u_perp, 0.0)
        H_b = Hstar_b
        dU = (TriCw * (out_flux * H_b[:, None] * npx.U[:, None]
                       + in_flux * H_b[TriC] * npx.U[TriC])
              / TriA[:, None])
        dV = (TriCw * (out_flux * H_b[:, None] * npx.V[:, None]
                       + in_flux * H_b[TriC] * npx.V[TriC])
              / TriA[:, None])
        divQU = jnp.where(act, dU, 0.0).sum(axis=1)
        divQV = jnp.where(act, dV, 0.0).sum(axis=1)
        return (jnp.where(lm.b, divQU, 0.0), jnp.where(lm.b, divQV, 0.0))

    def viscUV(npx, lm: LaddieMasks, H_b, H_c):
        """Horizontal momentum viscosity (laddie_velocity.f90:211)."""
        oc_nbr = lm.oc_a[md.Tri][TriC].any(axis=2) if False else None
        # neighbour ocean mask on b-grid
        tri_oc_b = lm.cf_b
        dU = npx.U[TriC] - npx.U[:, None]
        dV = npx.V[TriC] - npx.V[:, None]
        dUabs = jnp.sqrt(dU ** 2 + dV ** 2)
        Ah = C.laddie_viscosity * dUabs * TriCw / 100.0
        Hc = H_c[TriE_j]
        coef = Ah * Hc / TriA[:, None] * TriCw / TriD
        # skip ocean-side neighbours (free slip toward open ocean)
        nbr_cf = tri_oc_b[TriC]
        act = mTriC & ~nbr_cf
        vU = jnp.where(act, coef * dU, 0.0).sum(axis=1)
        vV = jnp.where(act, coef * dV, 0.0).sum(axis=1)
        # no-slip at borders (missing neighbours)
        nb_border = (~mTriC).sum(axis=1)
        vU = vU - npx.U * C.laddie_viscosity * H_b / TriA * nb_border
        vV = vV - npx.V * C.laddie_viscosity * H_b / TriA * nb_border
        return (jnp.where(lm.b, vU, 0.0), jnp.where(lm.b, vV, 0.0))

    def divQTS(npx, lm: LaddieMasks, Hstar):
        """Upwind tracer divergence (laddie_tracers.f90 compute_divQTS)."""
        U_c = map_b_to_c(md, npx.U)
        V_c = map_b_to_c(md, npx.V)
        u_perp = U_c[md.VE] * md.D_x / md.D + V_c[md.VE] * md.D_y / md.D
        nbr_gr = lm.gr_a[md.C]
        nbr_oc = lm.oc_a[md.C]
        LcA = md.Cw / md.A[:, None]
        act = md.mask_C & ~nbr_gr

        def div_of(F):
            F_j = F[md.C]
            H_j = Hstar[md.C]
            out_f = jnp.maximum(u_perp, 0.0) * Hstar[:, None] * F[:, None]
            in_f = jnp.minimum(u_perp, 0.0) * jnp.where(
                nbr_oc, 0.0, H_j * F_j)
            return jnp.where(lm.a,
                             jnp.where(act, LcA * (out_f + in_f),
                                       0.0).sum(axis=1), 0.0)
        return div_of(npx.T), div_of(npx.S)

    def map_H_a_b(lm, H):
        """Active-masked a->b thickness map."""
        w = lm.a[md.Tri].astype(H.dtype)
        s = (H[md.Tri] * w).sum(axis=1)
        n = w.sum(axis=1)
        return jnp.where(n > 0, s / jnp.maximum(n, 1), C.laddie_thickness_minimum)

    def map_H_a_c(lm, H):
        w = lm.a[md.EV].astype(H.dtype)
        s = (H[md.EV] * w).sum(axis=1)
        n = w.sum(axis=1)
        return jnp.where(n > 0, s / jnp.maximum(n, 1),
                         C.laddie_thickness_minimum)

    def stage(npx_old: LaddieState, npx_ref: LaddieState, lm, forcing,
              dt_i, include_visc):
        """One fbrk3 stage (compute_H_npx + compute_UV_npx + compute_TS_npx)."""
        use_Ti = forcing["use_Ti"]
        ph = physics(npx_ref, lm, forcing, npx_ref.H, use_Ti)

        # -- thickness --
        sgd = forcing.get("SGD", 0.0)        # subglacial discharge [m/s]
        dQH = divQH(npx_ref, lm)
        dHdt0 = -dQH + ph["melt"] + ph["entr"] + sgd
        H_guess = npx_old.H + dHdt0 * dt_i
        entr_dmin = jnp.maximum(C.laddie_thickness_minimum - H_guess,
                                0.0) / dt_i
        entr = ph["entr"] + jnp.minimum(
            C.laddie_thickness_maximum - H_guess, 0.0) / dt_i
        entr = jnp.where(entr_dmin > 0, jnp.maximum(entr, 0.0), entr)
        detr = -jnp.minimum(entr, 0.0)
        dHdt = -dQH + ph["melt"] + entr + entr_dmin + sgd
        H_new = jnp.where(lm.a, npx_old.H + dHdt * dt_i, npx_old.H)
        H_new_b = map_H_a_b(lm, H_new)
        H_new_c = map_H_a_c(lm, H_new)

        # -- momentum --
        Hstar = npx_ref.H
        Hstar_b = map_H_a_b(lm, Hstar)
        Hstar_c = map_H_a_c(lm, Hstar)
        Hdrho_b = map_H_a_b(lm, ph["Hdrho_amb"])
        detr_b = md.M_map_a_b @ detr
        ddrho_dx_b = md.M_ddx_a_b @ ph["drho_amb"]
        ddrho_dy_b = md.M_ddy_a_b @ ph["drho_amb"]
        dH_dx_b = md.M_ddx_a_b @ Hstar
        dH_dy_b = md.M_ddy_a_b @ Hstar
        dHib_dx_b = forcing["dHib_dx_b"]
        dHib_dy_b = forcing["dHib_dy_b"]

        edge_tri = lm.cf_b | lm.gl_b
        PGF_x = jnp.where(
            edge_tri,
            grav * Hdrho_b * dHib_dx_b
            - 0.5 * grav * Hstar_b ** 2 * ddrho_dx_b,
            -grav * Hdrho_b * dH_dx_b + grav * Hdrho_b * dHib_dx_b
            - 0.5 * grav * Hstar_b ** 2 * ddrho_dx_b)
        PGF_y = jnp.where(
            edge_tri,
            grav * Hdrho_b * dHib_dy_b
            - 0.5 * grav * Hstar_b ** 2 * ddrho_dy_b,
            -grav * Hdrho_b * dH_dy_b + grav * Hdrho_b * dHib_dy_b
            - 0.5 * grav * Hstar_b ** 2 * ddrho_dy_b)

        H_ref_b = map_H_a_b(lm, npx_ref.H)
        dQU, dQV = divQUV_upstream(npx_ref, lm, H_ref_b)
        speed_ref = jnp.sqrt(npx_ref.U ** 2 + npx_ref.V ** 2)
        dHUdt = (-dQU + PGF_x
                 + fcor * Hstar_b * npx_ref.V
                 - C.laddie_drag_coefficient_mom * npx_ref.U * speed_ref
                 - detr_b * npx_ref.U)
        dHVdt = (-dQV + PGF_y
                 - fcor * Hstar_b * npx_ref.U
                 - C.laddie_drag_coefficient_mom * npx_ref.V * speed_ref
                 - detr_b * npx_ref.V)
        if include_visc:
            H_ref_c = map_H_a_c(lm, npx_ref.H)
            vU, vV = viscUV(npx_ref, lm, H_ref_b, H_ref_c)
            dHUdt = dHUdt + vU
            dHVdt = dHVdt + vV

        H_old_b = map_H_a_b(lm, npx_old.H)
        HU = npx_old.U * H_old_b + dHUdt * dt_i
        HV = npx_old.V * H_old_b + dHVdt * dt_i
        U_new = jnp.where(lm.b, HU / jnp.maximum(H_new_b, 1e-3), 0.0)
        V_new = jnp.where(lm.b, HV / jnp.maximum(H_new_b, 1e-3), 0.0)
        speed = jnp.sqrt(U_new ** 2 + V_new ** 2)
        lim = jnp.minimum(1.0, C.laddie_velocity_maximum
                          / jnp.maximum(speed, 1e-12))
        U_new = U_new * lim
        V_new = V_new * lim

        # -- tracers --
        dQT, dQS = divQTS(npx_ref, lm, Hstar)
        dHTdt = (-dQT + ph["melt"] * ph["T_base"]
                 - ph["gamma_T"] * (npx_ref.T - ph["T_base"])
                 + jnp.maximum(0.0, entr) * ph["T_amb"]
                 - jnp.maximum(0.0, detr) * npx_ref.T
                 + entr_dmin * ph["T_amb"]
                 # SGD water enters at the local freezing point and with
                 # zero salinity (laddie_tracers.f90:67,74)
                 + sgd * (freezing_lambda_2
                          + freezing_lambda_3 * forcing["Hib"]))
        dHSdt = (-dQS
                 + jnp.maximum(0.0, entr) * ph["S_amb"]
                 - jnp.maximum(0.0, detr) * npx_ref.S
                 + entr_dmin * ph["S_amb"])
        T_new = jnp.where(lm.a, (npx_old.T * npx_old.H + dHTdt * dt_i)
                          / jnp.maximum(H_new, 1e-3), npx_old.T)
        S_new = jnp.where(lm.a, (npx_old.S * npx_old.H + dHSdt * dt_i)
                          / jnp.maximum(H_new, 1e-3), npx_old.S)

        return LaddieState(H=H_new, U=U_new, V=V_new, T=T_new, S=S_new), ph

    def step(carry, lm: LaddieMasks, forcing):
        """One pseudo-time step.  `carry` = (now, nm1); euler/fbrk3 ignore
        nm1, the leapfrog-Robert-Asselin scheme (laddie_integration.f90
        integrate_lfra) uses both time levels."""
        now, nm1 = carry
        if scheme in ("fbrk3", ""):
            b1, b2, b3 = (C.laddie_fbrk3_beta1, C.laddie_fbrk3_beta2,
                          C.laddie_fbrk3_beta3)
            np13, _ = stage(now, now, lm, forcing, dt / 3, False)
            np13 = np13._replace(H=b1 * np13.H + (1 - b1) * now.H)
            np12, _ = stage(np13, np13, lm, forcing, dt / 2, False)
            np12 = np12._replace(H=b2 * np12.H + (1 - b2) * now.H)
            np1, ph = stage(np12, np12, lm, forcing, dt, True)
            np1 = np1._replace(H=b3 * np1.H + (1 - 2 * b3) * np12.H
                               + b3 * now.H)
            return (np1, np1), ph
        if scheme == "lfra":
            # leapfrog: tendencies at `now`, stepped from `nm1`
            # (laddie_integration.f90:171-255), then the standard
            # Robert-Asselin filter on the centre level with
            # nu = C%laddie_lfra_nu before it becomes nm1.
            np1, ph = stage(nm1, now, lm, forcing, dt, True)
            nu = C.laddie_lfra_nu
            filt = LaddieState(*(
                c + 0.5 * nu * (p + f - 2.0 * c)
                for c, p, f in zip(now, nm1, np1)))
            return (np1, filt), ph
        # euler
        np1, ph = stage(now, now, lm, forcing, dt, True)
        return (np1, np1), ph

    return step


def init_laddie_state(C, md: MeshData, lm: LaddieMasks, forcing):
    """Initial plume state (laddie_main: H=Hmin-ish, T/S ambient)."""
    dtype = md.A.dtype
    H0 = jnp.full(md.nV, C.laddie_initial_thickness, dtype)
    # ambient T,S at draft depth
    depths = forcing["z_ocean"]
    depth = jnp.maximum(0.0, -forcing["Hib"])
    nd = depths.shape[0]
    idx = jnp.clip(jnp.searchsorted(depths, depth) - 1, 0, nd - 2)
    w = jnp.clip((depth - depths[idx])
                 / jnp.maximum(depths[idx + 1] - depths[idx], 1e-9), 0, 1)
    ar = jnp.arange(md.nV)
    T0 = forcing["T_ocean"][ar, idx] * (1 - w) \
        + forcing["T_ocean"][ar, idx + 1] * w + C.laddie_initial_T_offset
    S0 = forcing["S_ocean"][ar, idx] * (1 - w) \
        + forcing["S_ocean"][ar, idx + 1] * w
    return LaddieState(H=H0, U=jnp.zeros(md.nTri, dtype),
                       V=jnp.zeros(md.nTri, dtype), T=T0, S=S0)


def run_laddie_leg(C, md: MeshData, state: LaddieState, lm: LaddieMasks,
                   forcing, duration_days: float, step_fn=None):
    """Integrate the plume for `duration_days` of pseudo-time; returns
    (state, melt [m ice/yr] on the a-grid)."""
    step_fn = step_fn or make_laddie_step(C, md)
    n_steps = max(1, int(duration_days * 86400.0 / C.dt_laddie))

    def body(i, carry):
        (now, nm1), _ = carry
        (now2, nm12), ph = step_fn((now, nm1), lm, forcing)
        return ((now2, nm12), ph["melt"])

    (state, _), melt = jax.lax.fori_loop(
        0, n_steps, body,
        ((state, state), jnp.zeros(md.nV, md.A.dtype)))
    # melt is in m/s of ice; convert to m ice / yr
    return state, melt * sec_per_year


def run_laddie_leg_with_diag(C, md: MeshData, state: LaddieState,
                             lm: LaddieMasks, forcing,
                             duration_days: float, step_fn=None):
    """run_laddie_leg + one extra step to expose the full physics
    diagnostics dict (melt/entr/detr/gammas/T_base/T_amb/S_amb) for the
    LADDIE output files (laddie_mesh_output.f90's field set)."""
    step_fn = step_fn or make_laddie_step(C, md)
    state, melt = run_laddie_leg(C, md, state, lm, forcing,
                                 duration_days, step_fn)
    _, ph = step_fn((state, state), lm, forcing)
    return state, melt, {k: v for k, v in ph.items()}


# ---------------------------------------------------------------------------
# Active-set compaction: the TPU-native equivalent of the reference's
# LADDIE load-balancing repartitioning (mesh_repartitioning.f90:31-101 +
# LADDIE_main_model.f90:69-84). The masked full-mesh formulation above is
# correct but pays ~nV/nShelf of every plume substep; here the shelf +
# 3 neighbour rings are extracted into a compact sub-MeshData (static
# shapes, padded to PAD_MULT buckets) on the host at coupling cadence,
# the whole pseudo-time leg runs on the compact arrays, and the melt /
# plume state scatter back to the full mesh.
# ---------------------------------------------------------------------------

_PAD_MULT = 256


def _ring_expand(C_tbl, keep, n_rings):
    """Expand a vertex mask by n_rings of mesh connectivity (host)."""
    for _ in range(n_rings):
        nb = C_tbl[keep]
        nb = nb[nb >= 0]
        grown = keep.copy()
        grown[nb] = True
        keep = grown
    return keep


def build_compact_laddie_md(md: MeshData, shelf_np):
    """(md_c, V_keep, Tri_keep, E_keep) - a compact MeshData restricted
    to the shelf + 3 rings (every evaluated row's full operator stencil
    stays inside). Entity sets are padded to _PAD_MULT multiples by
    repeating row 0 (masked out; scatter-back ignores pads)."""
    from types import SimpleNamespace
    from ..core.mesh_data import build_mesh_data

    mesh = md._host_mesh
    keep = _ring_expand(mesh.C, shelf_np.astype(bool).copy(), 3)
    V_keep = np.where(keep)[0]
    in_keep = keep
    tri_in = in_keep[mesh.Tri].all(axis=1)
    Tri_keep = np.where(tri_in)[0]
    e_in = in_keep[mesh.EV].all(axis=1)
    E_keep = np.where(e_in)[0]

    def _pad(idx):
        n = len(idx)
        np_pad = (-n) % _PAD_MULT
        return np.concatenate([idx, np.repeat(idx[:1], np_pad)]), n

    V_keep, nVr = _pad(V_keep)
    Tri_keep, nTr = _pad(Tri_keep)
    E_keep, nEr = _pad(E_keep)

    mapV = np.full(mesh.nV, -1, np.int64)
    mapV[V_keep[:nVr]] = np.arange(nVr)
    mapT = np.full(mesh.nTri, -1, np.int64)
    mapT[Tri_keep[:nTr]] = np.arange(nTr)
    mapE = np.full(mesh.nE, -1, np.int64)
    mapE[E_keep[:nEr]] = np.arange(nEr)

    def remap(tbl, mp):
        out = np.where(tbl >= 0, mp[np.maximum(tbl, 0)], -1)
        return out

    ops = mesh.operators

    def sl(A, rows, cols):
        return A.tocsr()[rows][:, cols].tocsr()

    lite = SimpleNamespace(
        nV=len(V_keep), nTri=len(Tri_keep), nE=len(E_keep),
        V=mesh.V[V_keep], TriGC=mesh.TriGC[Tri_keep],
        A=mesh.A[V_keep], TriA=mesh.TriA[Tri_keep], R=mesh.R[V_keep],
        zeta=mesh.zeta, zeta_stag=mesh.zeta_stag,
        C=remap(mesh.C[V_keep], mapV),
        VE=remap(mesh.VE[V_keep], mapE),
        Cw=mesh.Cw[V_keep],
        D_x=mesh.D_x[V_keep], D_y=mesh.D_y[V_keep], D=mesh.D[V_keep],
        Tri=remap(mesh.Tri[Tri_keep], mapV),
        EV=remap(mesh.EV[E_keep], mapV),
        ETri=remap(mesh.ETri[E_keep], mapT),
        TriC=remap(mesh.TriC[Tri_keep], mapT),
        TriE=remap(mesh.TriE[Tri_keep], mapE),
        Tricc=mesh.Tricc[Tri_keep],
        VBI=mesh.VBI[V_keep],
        operators=SimpleNamespace(**{
            name: sl(getattr(ops, name), r_keep, c_keep)
            for name, (r_keep, c_keep) in {
                "M_ddx_a_a": (V_keep, V_keep),
                "M_ddy_a_a": (V_keep, V_keep),
                "M_map_a_b": (Tri_keep, V_keep),
                "M_ddx_a_b": (Tri_keep, V_keep),
                "M_ddy_a_b": (Tri_keep, V_keep),
                "M_map_b_a": (V_keep, Tri_keep),
                "M_ddx_b_a": (V_keep, Tri_keep),
                "M_ddy_b_a": (V_keep, Tri_keep),
                "M_ddx_b_b": (Tri_keep, Tri_keep),
                "M_ddy_b_b": (Tri_keep, Tri_keep),
                "M2_ddx_b_b": (Tri_keep, Tri_keep),
                "M2_ddy_b_b": (Tri_keep, Tri_keep),
                "M2_d2dx2_b_b": (Tri_keep, Tri_keep),
                "M2_d2dxdy_b_b": (Tri_keep, Tri_keep),
                "M2_d2dy2_b_b": (Tri_keep, Tri_keep),
            }.items()}),
    )
    # pad rows carry -1 connectivity (fully masked); keep row 0 geometry
    pad_V = np.arange(len(V_keep)) >= nVr
    lite.C[pad_V] = -1
    lite.VE[pad_V] = -1
    pad_T = np.arange(len(Tri_keep)) >= nTr
    lite.TriC[pad_T] = -1
    md_c = build_mesh_data(lite, dtype=md.A.dtype)
    return md_c, (V_keep, nVr), (Tri_keep, nTr), (E_keep, nEr)


def make_run_bmb_laddie(C, md: MeshData, region_name: str):
    """BMB coupling: run a LADDIE leg each call (BMB_main.f90 'laddie').

    With tpu_laddie_compaction (default on) the leg runs on the
    compacted shelf sub-mesh; the compact MeshData + step function are
    rebuilt only when the shelf mask changes (the reference repartitions
    at the same cadence, LADDIE_main_model.f90:69-84)."""
    from ..models.ocean import ocean_depth_axis
    do_compact = bool(getattr(C, "tpu_laddie_compaction", True))
    step_fn = None if do_compact else make_laddie_step(C, md)
    calc_sgd = make_calc_SGD(C, md)
    laddie_state = {}

    def _forcing_full(time, s, masks, ocean):
        dHib_dx_b = md.M_ddx_a_b @ s.Hib
        dHib_dy_b = md.M_ddy_a_b @ s.Hib
        forcing = {
            "Hib": s.Hib, "dHib_dx_b": dHib_dx_b, "dHib_dy_b": dHib_dy_b,
            # surface-layer ice temperature in degC (the reference
            # converts: laddie_forcing_main.f90:169 'ice%Ti - 273.15')
            "Ti_base": s.Ti[:, 0] - 273.15,
            "use_Ti": jnp.asarray(C.choice_thermo_model != "none"),
            "z_ocean": jnp.asarray(ocean_depth_axis(C), md.A.dtype),
            "T_ocean": ocean["T"], "S_ocean": ocean["S"],
        }
        if calc_sgd is not None:
            forcing["SGD"] = calc_sgd(masks["mask_floating_ice"],
                                      masks["mask_gl_fl"], time)
        return forcing

    def _run_full(time, s, masks, ocean):
        lm = laddie_masks(md, masks)
        forcing = _forcing_full(time, s, masks, ocean)
        if "state" not in laddie_state:
            laddie_state["state"] = init_laddie_state(C, md, lm, forcing)
            duration = C.time_duration_laddie_init
        else:
            duration = C.time_duration_laddie
        st, melt = run_laddie_leg(C, md, laddie_state["state"], lm,
                                  forcing, duration, step_fn)
        laddie_state["state"] = st
        return melt

    def _run_compact(time, s, masks, ocean):
        shelf_np = np.asarray(masks["mask_floating_ice"])
        key = shelf_np.tobytes()
        if laddie_state.get("compact_key") != key:
            md_c, Vk, Tk, Ek = build_compact_laddie_md(md, shelf_np)
            laddie_state.update(
                compact_key=key, md_c=md_c, Vk=Vk, Tk=Tk, Ek=Ek,
                step_c=make_laddie_step(C, md_c))
        md_c = laddie_state["md_c"]
        V_keep, nVr = laddie_state["Vk"]
        Tri_keep, nTr = laddie_state["Tk"]
        iV = jnp.asarray(V_keep)
        iT = jnp.asarray(Tri_keep)

        masks_c = {k: masks[k][iV] for k in
                   ("mask_floating_ice", "mask_grounded_ice",
                    "mask_icefree_land", "mask_icefree_ocean",
                    "mask_gl_fl")}
        lm = laddie_masks(md_c, masks_c)
        forcing = _forcing_full(time, s, masks, ocean)
        fc = dict(forcing)
        for k in ("Hib", "Ti_base", "T_ocean", "S_ocean", "SGD"):
            if k in fc:
                fc[k] = fc[k][iV]
        for k in ("dHib_dx_b", "dHib_dy_b"):
            fc[k] = fc[k][iT]

        if "state" not in laddie_state:
            laddie_state["state"] = init_laddie_state(C, md, laddie_masks(
                md, masks), forcing)
            duration = C.time_duration_laddie_init
        else:
            duration = C.time_duration_laddie
        full = laddie_state["state"]
        st_c = LaddieState(H=full.H[iV], U=full.U[iT], V=full.V[iT],
                           T=full.T[iV], S=full.S[iV])
        st_c, melt_c = run_laddie_leg(C, md_c, st_c, lm, fc, duration,
                                      laddie_state["step_c"])
        # scatter the compact plume state + melt back to the full mesh
        iVr, iTr = iV[:nVr], iT[:nTr]
        laddie_state["state"] = LaddieState(
            H=full.H.at[iVr].set(st_c.H[:nVr]),
            U=full.U.at[iTr].set(st_c.U[:nTr]),
            V=full.V.at[iTr].set(st_c.V[:nTr]),
            T=full.T.at[iVr].set(st_c.T[:nVr]),
            S=full.S.at[iVr].set(st_c.S[:nVr]))
        return jnp.zeros(md.nV, md.A.dtype).at[iVr].set(melt_c[:nVr])

    def run(time, s, masks, fraction_gr, ocean=None):
        melt = (_run_compact if do_compact else _run_full)(
            time, s, masks, ocean)
        # BMB convention: negative = melt
        bmb_shelf = -melt
        from .bmb import apply_bmb_subgrid_scheme
        bmb = apply_bmb_subgrid_scheme(C, masks, fraction_gr, bmb_shelf)
        return jnp.clip(bmb, -C.BMB_maximum_allowed_melt_rate,
                        C.BMB_maximum_allowed_refreezing_rate)
    return run
