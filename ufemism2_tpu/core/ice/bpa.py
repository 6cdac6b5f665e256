"""BPA (Blatter-Pattyn approximation) 3-D stress balance, matrix-free.

TPU-native re-design of src/UFEMISM/ice_dynamics/conservation_of_momentum/
BPA/BPA_main.f90: the 3-D momentum operator

  u-row: 4 eta uxx + 4 eta_x ux + eta uyy + eta_y uy + eta uzz + eta_z uz
       + 3 eta vxy + 2 eta_x vy + eta_y vx  = -tau_dx   (tau = rho g grad h)

acts on (u, v) fields [nTri, nz]. Instead of assembling the 2*nTri*nz
stiffness matrix with pre-built 3-D bk operators
(mesh_disc_calc_matrix_operators_3D.f90, 1074 LoC), physical derivatives
are composed matrix-free: per-layer horizontal ELL SpMVs plus vertical
zeta-stencils plus dzeta/dx cross terms (d/dx = d/dxp + dzeta_dx d/dzeta).
Ghost-point eliminated zero-stress surface and sliding basal BCs follow
the reference's derivation (BPA_main.f90:648-1165); lateral borders use
the configured zero/infinite velocity BCs. Solved by preconditioned GMRES
inside the standard viscosity iteration.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# per-solve Krylov budget: device-liveness valve for the remote TPU
# worker's blocking-call watchdog (see core/ice/pc.py); OFF on local
# backends where no watchdog exists and configs may ask for 5000 its
_AXB_SOLVE_BUDGET = int(os.environ.get(
    "UF_AXB_SOLVE_BUDGET",
    "8000" if "axon" in os.environ.get("JAX_PLATFORMS", "") else str(2 ** 30)))

from ..mesh_data import MeshData
from ...utils.constants import ice_density, grav
from ...ops.krylov import (gmres, estimate_lambda_max,
                           make_chebyshev_preconditioner,
                           make_neumann_preconditioner)
from .masks import determine_masks
from .rheology import calc_ice_rheology_glen
from .subgrid import (calc_grounded_fractions_bilin_TAF,
                      calc_grounded_fractions_b_from_a,
                      calc_effective_thickness)
from .sliding import calc_basal_friction_coefficient
from .ssadiva import calc_TriBI, _bed_roughness_fields
from ...mesh.zeta import vertical_average


class _BPACarry(NamedTuple):
    u: jnp.ndarray
    v: jnp.ndarray
    beta_b_b: jnp.ndarray
    relax: jnp.ndarray
    eps_sq0: jnp.ndarray
    L2: jnp.ndarray
    n_diverg: jnp.ndarray
    it: jnp.ndarray
    n_axb: jnp.ndarray
    done: jnp.ndarray


def make_solve_bpa(C, md: MeshData, bedrock_cdfs=None):
    """Build solve(Hi, Hs, Hb, SL, Ti, s) for the BPA."""
    precond_kind = getattr(C, "tpu_stress_balance_precond", "chebyshev")
    precond_deg = int(getattr(C, "tpu_stress_balance_precond_degree", 5))
    krylov_restart = int(getattr(C, "tpu_stress_balance_krylov_restart", 60))
    n_glen = C.Glens_flow_law_exponent
    no_sliding = C.choice_sliding_law == "no_sliding"
    mesh = md._host_mesh
    nz = md.nz
    zeta = md.zeta
    dzeta = float(np.asarray(mesh.zeta)[1] - np.asarray(mesh.zeta)[0])

    # lateral BC masks (same side classification as SSA/DIVA)
    TriBI = calc_TriBI(mesh)
    sides = {"north": (1, 2), "east": (3, 4), "south": (5, 6), "west": (7, 8)}
    zero_u = np.zeros(mesh.nTri, bool)
    zero_v = np.zeros(mesh.nTri, bool)
    inf_u = np.zeros(mesh.nTri, bool)
    inf_v = np.zeros(mesh.nTri, bool)
    for side, codes in sides.items():
        on = np.isin(TriBI, codes)
        for comp, (zz, ii) in {"u": (zero_u, inf_u),
                               "v": (zero_v, inf_v)}.items():
            bc = getattr(C, f"BC_{comp}_{side}")
            if bc == "zero":
                zz |= on
            else:   # infinite / periodic treated as neighbour-mean here
                ii |= on
    bc_free = jnp.asarray(TriBI == 0)
    bc_zero_u, bc_zero_v = jnp.asarray(zero_u), jnp.asarray(zero_v)
    bc_inf_u, bc_inf_v = jnp.asarray(inf_u), jnp.asarray(inf_v)

    mask_TriC = mesh.TriC >= 0
    TriC = jnp.asarray(np.where(mask_TriC, mesh.TriC, 0), jnp.int32)
    mTriC = jnp.asarray(mask_TriC)
    n_nbr = jnp.asarray(mask_TriC.sum(axis=1), md.A.dtype)

    # M2 operator diagonals for the vertical-line preconditioner's
    # horizontal-diagonal contribution (same extraction as hybrid.py)
    _dtype = md.A.dtype
    _ops = mesh.operators
    d_ddx = jnp.asarray(_ops.M2_ddx_b_b.diagonal(), _dtype)
    d_ddy = jnp.asarray(_ops.M2_ddy_b_b.diagonal(), _dtype)
    d_dxx = jnp.asarray(_ops.M2_d2dx2_b_b.diagonal(), _dtype)
    d_dyy = jnp.asarray(_ops.M2_d2dy2_b_b.diagonal(), _dtype)

    def nbr_mean_residual(x):
        s = jnp.where(mTriC[:, :, None], x[TriC], 0.0).sum(axis=1)
        return s - n_nbr[:, None] * x

    def ddzeta(f):
        """Central d/dzeta with one-sided ends [nTri, nz]."""
        out = jnp.empty_like(f)
        out = out.at[:, 1:-1].set((f[:, 2:] - f[:, :-2]) / (2 * dzeta))
        out = out.at[:, 0].set((f[:, 1] - f[:, 0]) / dzeta)
        out = out.at[:, -1].set((f[:, -1] - f[:, -2]) / dzeta)
        return out

    def solve(md, Hi, Hs, Hb, SL, Ti, s):
        # md is the runtime MeshData jit argument (operators
        # stay out of the compiled constant pool)
        masks = determine_masks(md, Hi, Hb, SL)
        A_flow = calc_ice_rheology_glen(C, md, Hi, Hs, Ti,
                                        masks["mask_grounded_ice"],
                                        masks["mask_floating_ice"])
        from .subgrid import calc_grounded_fractions
        fraction_gr, fraction_gr_b = calc_grounded_fractions(
            C, md, Hi, Hb, SL, masks["mask_floating_ice"],
            dHb=s.dHb, bedrock_cdfs=bedrock_cdfs)
        Hi_eff, _ = calc_effective_thickness(md, Hi, Hb, SL)
        # geometry gradients at FULL accuracy (ops.sparse.exact_mv)
        Hs_slope = jnp.sqrt(md.M_ddx_a_a.exact_matvec(Hs) ** 2
                            + md.M_ddy_a_a.exact_matvec(Hs) ** 2)
        bed_roughness = _bed_roughness_fields(C, md, s.bed_roughness)

        Hi_b = jnp.maximum(md.M_map_a_b.exact_matvec(Hi), 0.1)
        dh_dx_b = md.M_ddx_a_b.exact_matvec(Hs)
        dh_dy_b = md.M_ddy_a_b.exact_matvec(Hs)
        db_dx_b = md.M_ddx_a_b.exact_matvec(Hs - Hi)
        db_dy_b = md.M_ddy_a_b.exact_matvec(Hs - Hi)
        tau_dx = -ice_density * grav * dh_dx_b
        tau_dy = -ice_density * grav * dh_dy_b

        # zeta coordinate gradients on the bk grid
        dHi_dx_b = md.M_ddx_a_b.exact_matvec(Hi)
        dHi_dy_b = md.M_ddy_a_b.exact_matvec(Hi)
        zz_b = -1.0 / Hi_b                                     # dzeta/dz
        zx_b = (dh_dx_b[:, None] - zeta[None, :]
                * dHi_dx_b[:, None]) / Hi_b[:, None]           # dzeta/dx
        zy_b = (dh_dy_b[:, None] - zeta[None, :]
                * dHi_dy_b[:, None]) / Hi_b[:, None]

        def ddx(f):
            return md.M2_ddx_b_b @ f + zx_b * ddzeta(f)

        def ddy(f):
            return md.M2_ddy_b_b @ f + zy_b * ddzeta(f)

        def ddz(f):
            return zz_b[:, None] * ddzeta(f)

        Q_fac = 2.0 / dzeta ** 2 * zz_b ** 2    # [nTri] (dzeta/dz)^2 * 2/dzeta^2

        def body(c: _BPACarry) -> _BPACarry:
            # strain rates + effective viscosity on ak (vertices x nz)
            du_dx = ddx(c.u)
            du_dy = ddy(c.u)
            dv_dx = ddx(c.v)
            dv_dy = ddy(c.v)
            du_dz = ddz(c.u)
            dv_dz = ddz(c.v)

            def to_a(f):
                return md.M_map_b_a @ f

            eps_sq = (to_a(du_dx) ** 2 + to_a(dv_dy) ** 2
                      + to_a(du_dx) * to_a(dv_dy)
                      + 0.25 * (to_a(du_dy) + to_a(dv_dx)) ** 2
                      + 0.25 * (to_a(du_dz) ** 2 + to_a(dv_dz) ** 2)
                      + c.eps_sq0)
            A_min = 1e-18
            eta_max = 0.5 * A_min ** (-1.0 / n_glen) * \
                c.eps_sq0 ** ((1.0 - n_glen) / (2.0 * n_glen))
            eta_a = 0.5 * A_flow ** (-1.0 / n_glen) * \
                eps_sq ** ((1.0 - n_glen) / (2.0 * n_glen))
            eta_a = jnp.clip(eta_a, C.visc_eff_min, eta_max)
            eta = md.M_map_a_b @ eta_a
            eta_x = ddx(eta)
            eta_y = ddy(eta)
            eta_z = ddz(eta)

            # sliding law on the a-grid from basal velocities
            u_base_a = md.M_map_b_a @ c.u[:, nz - 1]
            v_base_a = md.M_map_b_a @ c.v[:, nz - 1]
            beta_a = calc_basal_friction_coefficient(
                C, md, bed_roughness, u_base_a, v_base_a, Hi, Hi_eff, Hb,
                SL, Hs_slope, fraction_gr, masks, V_host=mesh.V)
            beta_b = md.M_map_a_b @ beta_a
            if C.do_GL_subgrid_friction:
                beta_b = beta_b * \
                    fraction_gr_b ** C.subgrid_friction_exponent_on_B_grid

            eta_base = jnp.maximum(eta[:, nz - 1], C.visc_eff_min)

            def A_op(uv):
                u, v = uv
                ux, uy = ddx(u), ddy(u)
                vx, vy = ddx(v), ddy(v)
                uxx, uyy, uxy = ddx(ux), ddy(uy), ddy(ux)
                vxx, vyy, vxy = ddx(vx), ddy(vy), ddy(vx)
                uz = ddz(u)
                vz = ddz(v)
                uzz = zz_b[:, None] ** 2 * _d2dzeta2(u)
                vzz = zz_b[:, None] ** 2 * _d2dzeta2(v)

                Au = (4 * eta * uxx + 4 * eta_x * ux + eta * uyy
                      + eta_y * uy + eta * uzz + eta_z * uz
                      + 3 * eta * vxy + 2 * eta_x * vy + eta_y * vx)
                Av = (4 * eta * vyy + 4 * eta_y * vy + eta * vxx
                      + eta_x * vx + eta * vzz + eta_z * vz
                      + 3 * eta * uxy + 2 * eta_y * ux + eta_x * uy)

                # surface row (k=0): ghost-point-eliminated zero stress
                S_u0 = (2 * dh_dx_b * (2 * ux[:, 0] + vy[:, 0])
                        + dh_dy_b * (uy[:, 0] + vx[:, 0]))
                S_v0 = (2 * dh_dy_b * (2 * vy[:, 0] + ux[:, 0])
                        + dh_dx_b * (vx[:, 0] + uy[:, 0]))
                uzz0 = Q_fac * (u[:, 1] - u[:, 0]
                                - dzeta / zz_b * S_u0)
                vzz0 = Q_fac * (v[:, 1] - v[:, 0]
                                - dzeta / zz_b * S_v0)
                Au_s = (4 * eta[:, 0] * uxx[:, 0] + 4 * eta_x[:, 0] * ux[:, 0]
                        + eta[:, 0] * uyy[:, 0] + eta_y[:, 0] * uy[:, 0]
                        + eta[:, 0] * uzz0 + eta_z[:, 0] * S_u0
                        + 3 * eta[:, 0] * vxy[:, 0]
                        + 2 * eta_x[:, 0] * vy[:, 0]
                        + eta_y[:, 0] * vx[:, 0])
                Av_s = (4 * eta[:, 0] * vyy[:, 0] + 4 * eta_y[:, 0] * vy[:, 0]
                        + eta[:, 0] * vxx[:, 0] + eta_x[:, 0] * vx[:, 0]
                        + eta[:, 0] * vzz0 + eta_z[:, 0] * S_v0
                        + 3 * eta[:, 0] * uxy[:, 0]
                        + 2 * eta_y[:, 0] * ux[:, 0]
                        + eta_x[:, 0] * uy[:, 0])
                Au = Au.at[:, 0].set(Au_s)
                Av = Av.at[:, 0].set(Av_s)

                # base row (k=nz-1): sliding BC (BPA_main.f90:893-1165)
                kb = nz - 1
                P_u = (2 * db_dx_b * (2 * ux[:, kb] + vy[:, kb])
                       + db_dy_b * (uy[:, kb] + vx[:, kb])
                       + beta_b / eta_base * u[:, kb])
                P_v = (2 * db_dy_b * (2 * vy[:, kb] + ux[:, kb])
                       + db_dx_b * (vx[:, kb] + uy[:, kb])
                       + beta_b / eta_base * v[:, kb])
                Q = Q_fac * eta[:, kb]
                R = 2 * eta[:, kb] / dzeta * zz_b + eta_z[:, kb]
                Au_b = (4 * eta[:, kb] * uxx[:, kb]
                        + 4 * eta_x[:, kb] * ux[:, kb]
                        + eta[:, kb] * uyy[:, kb]
                        + eta_y[:, kb] * uy[:, kb]
                        + 3 * eta[:, kb] * vxy[:, kb]
                        + 2 * eta_x[:, kb] * vy[:, kb]
                        + eta_y[:, kb] * vx[:, kb]
                        + Q * (u[:, kb - 1] - u[:, kb]) + R * P_u)
                Av_b = (4 * eta[:, kb] * vyy[:, kb]
                        + 4 * eta_y[:, kb] * vy[:, kb]
                        + eta[:, kb] * vxx[:, kb]
                        + eta_x[:, kb] * vx[:, kb]
                        + 3 * eta[:, kb] * uxy[:, kb]
                        + 2 * eta_y[:, kb] * ux[:, kb]
                        + eta_x[:, kb] * uy[:, kb]
                        + Q * (v[:, kb - 1] - v[:, kb]) + R * P_v)
                if no_sliding:
                    # no-slip: u = v = 0 at the base (BPA_main.f90:1007)
                    Au = Au.at[:, kb].set(u[:, kb])
                    Av = Av.at[:, kb].set(v[:, kb])
                else:
                    Au = Au.at[:, kb].set(Au_b)
                    Av = Av.at[:, kb].set(Av_b)

                # lateral borders
                Au = jnp.where(bc_free[:, None], Au, jnp.where(
                    bc_zero_u[:, None], u, nbr_mean_residual(u)))
                Av = jnp.where(bc_free[:, None], Av, jnp.where(
                    bc_zero_v[:, None], v, nbr_mean_residual(v)))
                return (Au, Av)

            # Vertical-line preconditioner: the BPA operator is
            # dominated by the vertical shear term eta*uzz (columns are
            # metres thick, horizontally km wide), so solve the exact
            # per-column tridiagonal of A_op - vertical diffusion +
            # surface/sliding BC rows + the horizontal operators'
            # diagonal - with the batched Thomas kernel. This is the
            # 3-D counterpart of the SSA/DIVA block-Jacobi (the strength
            # class of the reference's PETSc bjacobi+ILU).
            from ...ops.tridiag import thomas_batched
            zz2 = (zz_b ** 2 / dzeta ** 2)[:, None]           # [nTri,1]
            ez_zz = (eta_z * zz_b[:, None]) / (2 * dzeta)
            H_diag = (4 * eta * d_dxx[:, None] + eta * d_dyy[:, None]
                      + 4 * eta_x * d_ddx[:, None]
                      + eta_y * d_ddy[:, None])
            sub = eta[:, 1:] * zz2 - ez_zz[:, 1:]     # coeff of u[k-1]
            sup = eta[:, :-1] * zz2 + ez_zz[:, :-1]   # coeff of u[k+1]
            dia = -2.0 * eta * zz2 + H_diag
            # surface row (k=0): eta0*Q_fac*(u1 - u0)
            dia = dia.at[:, 0].set(-eta[:, 0] * Q_fac + H_diag[:, 0])
            sup = sup.at[:, 0].set(eta[:, 0] * Q_fac)
            # base row: Q*(u[kb-1]-u[kb]) + R*beta/eta_base*u[kb]
            Qb = Q_fac * eta[:, nz - 1]
            Rb = 2 * eta[:, nz - 1] / dzeta * zz_b + eta_z[:, nz - 1]
            dia = dia.at[:, nz - 1].set(
                -Qb + Rb * beta_b / eta_base + H_diag[:, nz - 1])
            sub = sub.at[:, nz - 2].set(Qb)
            if no_sliding:
                dia = dia.at[:, nz - 1].set(1.0)
                sub = sub.at[:, nz - 2].set(0.0)
            # BC (non-free) rows are identity over the whole column
            dia = jnp.where(bc_free[:, None], dia, 1.0)
            sub = jnp.where(bc_free[:, None], sub, 0.0)
            sup = jnp.where(bc_free[:, None], sup, 0.0)

            def M_pre(r):
                ru, rv = r
                return (thomas_batched(sub, dia, sup, ru),
                        thomas_batched(sub, dia, sup, rv))

            b_u = jnp.where(bc_free[:, None],
                            jnp.broadcast_to(-tau_dx[:, None], c.u.shape),
                            0.0)
            b_v = jnp.where(bc_free[:, None],
                            jnp.broadcast_to(-tau_dy[:, None], c.v.shape),
                            0.0)
            if no_sliding:
                b_u = b_u.at[:, nz - 1].set(0.0)
                b_v = b_v.at[:, nz - 1].set(0.0)
            rtol = C.stress_balance_PETSc_rtol
            if b_u.dtype == jnp.float32:   # f32 precision floor
                rtol = max(rtol, 1e-5)
            # polynomial acceleration over the diagonal base (see
            # ssadiva.py: replaces the ILU-class robustness of the
            # reference's PETSc configuration with a TPU-vectorisable
            # fixed-degree Chebyshev/Neumann polynomial)
            if precond_kind == "chebyshev":
                lam = estimate_lambda_max(
                    lambda w: M_pre(A_op(w)), (b_u, b_v), n_its=10)
                Mp = make_chebyshev_preconditioner(A_op, M_pre,
                                                   precond_deg, lam)
            elif precond_kind == "neumann":
                Mp = make_neumann_preconditioner(A_op, M_pre, precond_deg)
            else:
                Mp = M_pre
            res = gmres(A_op, (b_u, b_v), x0=(c.u, c.v), M=Mp,
                        rtol=rtol,
                        abstol=C.stress_balance_PETSc_abstol,
                        restart=krylov_restart)
            u_new, v_new = res.x

            speed = jnp.sqrt(u_new ** 2 + v_new ** 2)
            lim = jnp.where(speed > C.vel_max, C.vel_max / speed, 1.0)
            u_new, v_new = u_new * lim, v_new * lim
            u_new = c.relax * u_new + (1 - c.relax) * c.u
            v_new = c.relax * v_new + (1 - c.relax) * c.v

            res1 = ((u_new - c.u) ** 2 + (v_new - c.v) ** 2).sum()
            res2 = ((u_new + c.u) ** 2 + (v_new + c.v) ** 2).sum()
            L2 = 2.0 * res1 / jnp.maximum(res2, 1e-8)
            diverged = L2 > c.L2
            n_div = jnp.where(diverged, c.n_diverg + 1, 0)
            do_rescue = n_div > 2
            relax = jnp.where(do_rescue, c.relax * 0.9, c.relax)
            eps_sq0 = jnp.where(do_rescue, c.eps_sq0 * 1.2, c.eps_sq0)
            n_div = jnp.where(do_rescue, 0, n_div)
            converged = L2 < C.visc_it_norm_dUV_tol
            return _BPACarry(u=u_new, v=v_new, beta_b_b=beta_b,
                             relax=relax, eps_sq0=eps_sq0, L2=L2,
                             n_diverg=n_div, it=c.it + 1,
                             n_axb=c.n_axb + res.n_iter, done=converged)

        def cond(c: _BPACarry):
            return ((~c.done) & (c.it <= C.visc_it_nit)
                    & (c.n_axb < _AXB_SOLVE_BUDGET))

        dtype = md.A.dtype
        init = _BPACarry(
            u=s.u_3D_b, v=s.v_3D_b,
            beta_b_b=jnp.zeros(md.nTri, dtype),
            relax=jnp.asarray(C.visc_it_relax, dtype),
            eps_sq0=jnp.asarray(C.Glens_flow_law_epsilon_sq_0, dtype),
            L2=jnp.asarray(1e9, dtype),
            n_diverg=jnp.asarray(0, jnp.int32),
            it=jnp.asarray(0, jnp.int32),
            n_axb=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False))
        out = jax.lax.while_loop(cond, body, init)

        u_vav = vertical_average(zeta, out.u, axis=-1)
        v_vav = vertical_average(zeta, out.v, axis=-1)
        return (u_vav, v_vav, out.u, out.v, out.it, out.n_axb)

    def _d2dzeta2(f):
        out = jnp.zeros_like(f)
        out = out.at[:, 1:-1].set(
            (f[:, 2:] + f[:, :-2] - 2 * f[:, 1:-1]) / dzeta ** 2)
        return out

    return solve
