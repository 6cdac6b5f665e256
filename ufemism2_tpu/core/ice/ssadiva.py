"""SSA / DIVA stress balance: matrix-free viscosity iteration + Krylov solve.

TPU-native re-design of the reference's SSA/DIVA machinery
(src/UFEMISM/ice_dynamics/conservation_of_momentum/SSA_DIVA/): instead of
assembling a 2nTri x 2nTri CSR stiffness matrix per viscosity iteration and
calling PETSc (solve_linearised_SSA_DIVA_infinite_slab.f90), the linearised
momentum operator

  u-row: 4 N d2u/dx2 + 4 dN/dx du/dx + N d2u/dy2 + dN/dy du/dy - beta_eff u
       + 3 N d2v/dxdy + 2 dN/dx dv/dy + dN/dy dv/dx  = -tau_dx
  v-row: symmetric

is applied matrix-free: 10 ELL SpMVs with the M2_* operators scaled by the
per-triangle fields (N, dN/dx, dN/dy, beta_eff), solved by BiCGSTAB with a
2x2 block-Jacobi preconditioner under lax.while_loop. The whole viscosity
iteration (DIVA_solver_infinite_slab.f90:52-231) including the adaptive
relaxation rescue ladder is one on-device while_loop.
"""

from __future__ import annotations

from typing import NamedTuple

import os

import jax
import jax.numpy as jnp
import numpy as np

# per-solve Krylov budget: device-liveness valve for the remote TPU
# worker's blocking-call watchdog (see core/ice/pc.py); OFF on local
# backends where no watchdog exists and configs may ask for 5000 its
_AXB_SOLVE_BUDGET = int(os.environ.get(
    "UF_AXB_SOLVE_BUDGET",
    "8000" if "axon" in os.environ.get("JAX_PLATFORMS", "") else str(2 ** 30)))

from ..mesh_data import MeshData, EField, EIndex
from ...parallel import comm
from ...utils.constants import ice_density, grav, seawater_density
from ...mesh.zeta import integrate_from_base_up, vertical_average
from ...ops.krylov import (bicgstab, gmres, estimate_lambda_max,
                           make_chebyshev_preconditioner,
                           make_neumann_preconditioner)
from .masks import determine_masks
from .rheology import calc_ice_rheology_glen
from .subgrid import (calc_grounded_fractions_bilin_TAF,
                      calc_grounded_fractions_b_from_a,
                      calc_grounded_fractions,
                      calc_effective_thickness)
from .sliding import calc_basal_friction_coefficient
from . import sia as sia_mod


# ---------------------------------------------------------------------------
# Host-side static data: triangle border indices + BC row classification
# ---------------------------------------------------------------------------

def calc_TriBI(mesh) -> np.ndarray:
    """Triangle border indices by tracing the domain border
    (mesh_secondary.f90:72 calc_TriBI)."""
    TriBI = np.zeros(mesh.nTri, dtype=np.int32)
    vbi = mesh.VBI
    sw = np.where(vbi == 6)[0]
    assert len(sw) > 0, "no southwest corner vertex"
    vi_sw = int(sw[0])
    vi = vi_sw
    corners = {}
    for _ in range(mesh.nV + 1):
        for t in mesh.iTri[vi][: mesh.niTri[vi]]:
            TriBI[t] = vbi[vi]
        vi = int(mesh.C[vi, mesh.nC[vi] - 1])
        if vbi[vi] in (2, 4, 8):
            corners[vbi[vi]] = vi
        if vi == vi_sw:
            break
    for code, cv in {6: vi_sw, **corners}.items():
        if mesh.niTri[cv] == 1:
            TriBI[mesh.iTri[cv, 0]] = code
    return TriBI


class _BCData(NamedTuple):
    free: np.ndarray       # [nTri] bool: interior rows (solve the PDE)
    zero_u: np.ndarray     # identity rows, rhs 0
    zero_v: np.ndarray
    inf_u: np.ndarray      # mean-of-neighbours rows, rhs 0
    inf_v: np.ndarray
    fix_u: np.ndarray      # identity rows, rhs = weighted copy of prev sol
    fix_v: np.ndarray
    copy_inds: np.ndarray  # [nTri, Kc] source triangles for fixed rows
    copy_w: np.ndarray     # [nTri, Kc] weights (normalised 1/d^2)


def _copy_tables(mesh, rows, targets):
    """For each row triangle, inverse-distance weights over the triangles
    around the vertex whose Voronoi cell contains the target point
    (find_ti_copy_* pattern, mesh_utilities.f90:2623,2681)."""
    from scipy.spatial import cKDTree
    Kc = int(mesh.niTri.max())
    copy_inds = np.zeros((mesh.nTri, Kc), dtype=np.int64)
    copy_w = np.zeros((mesh.nTri, Kc))
    if len(rows) == 0:
        return copy_inds, copy_w
    vtree = cKDTree(mesh.V)      # nearest vertex == containing Voronoi cell
    _, vis = vtree.query(targets)
    for k, (r, vi) in enumerate(zip(rows, vis)):
        ni = mesh.niTri[vi]
        tjs = mesh.iTri[vi, :ni]
        d = np.linalg.norm(mesh.TriGC[tjs] - targets[k], axis=1)
        w = 1.0 / np.maximum(d, 1e-3) ** 2
        copy_inds[r, :ni] = tjs
        copy_w[r, :ni] = w / w.sum()
    return copy_inds, copy_w


def make_bc_data(C, mesh) -> _BCData:
    """Classify border-triangle rows by the configured velocity BCs
    (solve_linearised_SSA_DIVA_infinite_slab.f90:109-134,481-641)."""
    TriBI = calc_TriBI(mesh)
    sides = {"north": (1, 2), "east": (3, 4), "south": (5, 6), "west": (7, 8)}
    nTri = mesh.nTri
    masks = {f"{c}_{t}": np.zeros(nTri, bool)
             for c in ("u", "v") for t in ("zero", "inf", "per", "ice")}
    for side, codes in sides.items():
        on = np.isin(TriBI, codes)
        for comp in ("u", "v"):
            bc = getattr(C, f"BC_{comp}_{side}")
            if bc == "zero":
                masks[f"{comp}_zero"] |= on
            elif bc == "infinite":
                masks[f"{comp}_inf"] |= on
            elif bc == "periodic_ISMIP-HOM":
                masks[f"{comp}_per"] |= on
            elif bc == "infinite_SSA_icestream":
                masks[f"{comp}_ice"] |= on
            else:
                raise ValueError(f"unknown BC_{comp}_{side} '{bc}'")
    free = TriBI == 0

    # fixed-row copy tables (periodic ISMIP-HOM and SSA-icestream rows both
    # copy the previous solution from an interior point)
    fix_u = masks["u_per"] | masks["u_ice"]
    fix_v = masks["v_per"] | masks["v_ice"]
    rows = np.where(fix_u | fix_v)[0]
    gc = mesh.TriGC
    targets = gc[rows].copy()
    per_rows = (masks["u_per"] | masks["v_per"])[rows]
    ice_rows = (masks["u_ice"] | masks["v_ice"])[rows]
    L = C.refgeo_idealised_ISMIP_HOM_L
    # periodic: displace by -+L/2 toward the domain centre
    targets[per_rows, 0] += np.where(gc[rows][per_rows, 0] > 0, -L / 2, L / 2)
    targets[per_rows, 1] += np.where(gc[rows][per_rows, 1] > 0, -L / 2, L / 2)
    # icestream: copy from x = 1/3 or 2/3 across the domain, same y
    x13 = mesh.xmin + (mesh.xmax - mesh.xmin) / 3.0
    x23 = mesh.xmin + (mesh.xmax - mesh.xmin) * 2.0 / 3.0
    targets[ice_rows, 0] = np.where(gc[rows][ice_rows, 0] < 0, x13, x23)
    copy_inds, copy_w = _copy_tables(mesh, rows, targets)

    return _BCData(free, masks["u_zero"], masks["v_zero"],
                   masks["u_inf"], masks["v_inf"],
                   fix_u, fix_v, copy_inds, copy_w)


# ---------------------------------------------------------------------------
# The linearised momentum operator + preconditioners (module level so
# solver experiments and alternative preconditioners can target the real
# operator; used by the viscosity iteration below)
# ---------------------------------------------------------------------------

def nbr_mean_residual(md, x, n_nbr):
    """sum(x[nbrs]) - n*x (the 'infinite' BC row)."""
    s = jnp.where(md.mask_TriC, md.ext_Tri(x)[md.TriC], 0.0).sum(axis=1)
    return s - n_nbr * x


def make_A(md, N_b, dN_dx_b, dN_dy_b, beta_eff_b, front=None):
    """The matrix-free linearised SSA/DIVA momentum operator
    (solve_linearised_SSA_DIVA_infinite_slab.f90 rows, applied as 10
    fused ELL SpMVs + elementwise scaling)."""
    bc_free = md.x("ssa_bc_free")
    bc_inf_u = md.x("ssa_bc_inf_u")
    bc_inf_v = md.x("ssa_bc_inf_v")
    n_nbr = md.mask_TriC.sum(axis=1).astype(N_b.dtype)
    M2x, M2y = md.M2_ddx_b_b, md.M2_ddy_b_b
    Mxx, Mxy, Myy = md.M2_d2dx2_b_b, md.M2_d2dxdy_b_b, md.M2_d2dy2_b_b

    def derivs(f):
        if md.M2_stack is not None:
            d = md.M2_stack.apply(f)
            return d[0], d[1], d[2], d[3], d[4]
        return M2x @ f, M2y @ f, Mxx @ f, Mxy @ f, Myy @ f

    def A(uv):
        u, v = uv
        if md.M2_stack is not None:
            # ONE gather + ONE contraction for all 10 derivative
            # fields: u and v ride the trailing axis of the stacked
            # input (and share one halo exchange on multi-chip)
            d = md.M2_stack.apply(jnp.stack([u, v], axis=-1))
            ddx_u, ddy_u, dxx_u, dxy_u, dyy_u = (
                d[i][:, 0] for i in range(5))
            ddx_v, ddy_v, dxx_v, dxy_v, dyy_v = (
                d[i][:, 1] for i in range(5))
        else:
            ddx_u, ddy_u, dxx_u, dxy_u, dyy_u = derivs(u)
            ddx_v, ddy_v, dxx_v, dxy_v, dyy_v = derivs(v)

        Au = (4 * N_b * dxx_u + 4 * dN_dx_b * ddx_u
              + N_b * dyy_u + dN_dy_b * ddy_u - beta_eff_b * u
              + 3 * N_b * dxy_v + 2 * dN_dx_b * ddy_v + dN_dy_b * ddx_v)
        Av = (4 * N_b * dyy_v + 4 * dN_dy_b * ddy_v
              + N_b * dxx_v + dN_dx_b * ddx_v - beta_eff_b * v
              + 3 * N_b * dxy_u + 2 * dN_dy_b * ddx_u + dN_dx_b * ddy_u)

        # BC rows: zero/fixed -> identity; infinite -> neighbour mean
        Au = jnp.where(bc_free, Au, jnp.where(
            bc_inf_u, nbr_mean_residual(md, u, n_nbr), u))
        Av = jnp.where(bc_free, Av, jnp.where(
            bc_inf_v, nbr_mean_residual(md, v, n_nbr), v))
        if front is not None:
            # ocean-pressure variant: Neumann ocean-back-pressure rows
            # at the calving front, identity rows off the ice
            # (solve_linearised_SSA_DIVA_ocean_pressure.f90:445-560:
            #  4 N n_x du/dx + N n_y du/dy + 2 N n_x dv/dy
            #    + N n_y dv/dx = tau_ox , and x<->y for v)
            is_front, off, n_x, n_y = front
            Au_f = (4 * N_b * n_x * ddx_u + N_b * n_y * ddy_u
                    + 2 * N_b * n_x * ddy_v + N_b * n_y * ddx_v)
            Av_f = (4 * N_b * n_y * ddy_v + N_b * n_x * ddx_v
                    + 2 * N_b * n_y * ddx_u + N_b * n_x * ddy_u)
            Au = jnp.where(off, u, jnp.where(is_front, Au_f, Au))
            Av = jnp.where(off, v, jnp.where(is_front, Av_f, Av))
        return (Au, Av)
    return A


BJD_BLOCK = 64     # triangles per dense Jacobi block (128x128 (u,v) system)


def register_bjdense_static(mesh, md: MeshData):
    """Static tables for the dense block-Jacobi preconditioner: for each
    Morton-contiguous block of BJD_BLOCK triangles, the in-block entries
    of the 5 shared-pattern b-grid operators plus flat scatter indices
    into the [nB, 128, 128] dense (u,v) blocks. TPU-native substitute for
    the strength class of PETSc's bjacobi+ILU (petsc_basic.f90): exact
    dense solves on 64-triangle subdomains, batch-inverted on the MXU
    each viscosity iteration. Single-device only (the tables live in
    nnz space, which the dist layer does not shard)."""
    if "bjd_vals" in md.extras:
        return
    ops = mesh.operators
    mats = [ops.M2_ddx_b_b.tocsr(), ops.M2_ddy_b_b.tocsr(),
            ops.M2_d2dx2_b_b.tocsr(), ops.M2_d2dxdy_b_b.tocsr(),
            ops.M2_d2dy2_b_b.tocsr()]
    nTri = mats[0].shape[0]
    B = BJD_BLOCK
    nB = (nTri + B - 1) // B
    U = (abs(mats[0]) + abs(mats[1]) + abs(mats[2]) + abs(mats[3])
         + abs(mats[4])).tocoo()
    r = U.row.astype(np.int64)
    c = U.col.astype(np.int64)
    sel = (r // B) == (c // B)
    r, c = r[sel], c[sel]
    vals5 = np.zeros((len(r), 5))
    q = r * nTri + c
    for k, m in enumerate(mats):
        mc = m.tocoo()
        key = mc.row.astype(np.int64) * nTri + mc.col.astype(np.int64)
        order = np.argsort(key)
        ks = key[order]
        pos = np.minimum(np.searchsorted(ks, q), len(ks) - 1)
        hit = ks[pos] == q
        vals5[hit, k] = mc.data[order][pos][hit]
    base = (r // B) * (128 * 128) + (2 * (r % B)) * 128 + 2 * (c % B)
    rows_all = np.arange(nB * B, dtype=np.int64)
    diag = ((rows_all // B) * (128 * 128)
            + (2 * (rows_all % B)) * 128 + 2 * (rows_all % B))
    dt = md.A.dtype
    md.extras.update({
        "bjd_vals": EField(jnp.asarray(vals5, dt), "BJDnnz"),
        "bjd_rows": EField(jnp.asarray(r, jnp.int32), "BJDnnz"),
        "bjd_base": EField(jnp.asarray(base, jnp.int32), "BJDnnz"),
        "bjd_diag": EField(jnp.asarray(diag, jnp.int32), "BJDrow"),
        "bjd_row_valid": EField(jnp.asarray(rows_all < nTri), "BJDrow"),
    })


def make_precond_dense(md, N_b, dN_dx_b, dN_dy_b, beta_eff_b, front=None):
    """Dense block-Jacobi: assemble the in-block entries of the
    linearised operator (same weights as make_A) into [nB, 128, 128]
    (u,v) blocks, batch-invert, apply as one batched matmul. BC rows keep
    the 2x2 scheme's diagonal approximation."""
    bc_free = md.x("ssa_bc_free")
    bc_inf_u = md.x("ssa_bc_inf_u")
    bc_inf_v = md.x("ssa_bc_inf_v")
    n_nbr = md.mask_TriC.sum(axis=1).astype(N_b.dtype)
    v5 = md.x("bjd_vals")
    rsel = md.x("bjd_rows")
    base = md.x("bjd_base")
    diag = md.x("bjd_diag")
    row_valid = md.x("bjd_row_valid")
    nTri = N_b.shape[0]
    B = BJD_BLOCK
    nB = row_valid.shape[0] // B
    dt = N_b.dtype

    Nr = N_b[rsel]
    dxr = dN_dx_b[rsel]
    dyr = dN_dy_b[rsel]
    ddx, ddy, dxx, dxy, dyy = (v5[:, k] for k in range(5))
    e_uu = 4 * Nr * dxx + 4 * dxr * ddx + Nr * dyy + dyr * ddy
    e_uv = 3 * Nr * dxy + 2 * dxr * ddy + dyr * ddx
    e_vu = 3 * Nr * dxy + 2 * dyr * ddx + dxr * ddy
    e_vv = 4 * Nr * dyy + 4 * dyr * ddy + Nr * dxx + dxr * ddx
    if front is not None:
        is_front, off, n_x, n_y = front
        fr = is_front[rsel]
        nxr, nyr = n_x[rsel], n_y[rsel]
        e_uu = jnp.where(fr, 4 * Nr * nxr * ddx + Nr * nyr * ddy, e_uu)
        e_vv = jnp.where(fr, 4 * Nr * nyr * ddy + Nr * nxr * ddx, e_vv)
        e_uv = jnp.where(fr, 2 * Nr * nxr * ddy + Nr * nyr * ddx, e_uv)
        e_vu = jnp.where(fr, 2 * Nr * nyr * ddx + Nr * nxr * ddy, e_vu)
        ok_r = (bc_free | is_front)[rsel] & ~off[rsel]
    else:
        ok_r = bc_free[rsel]
    e_uu = jnp.where(ok_r, e_uu, 0.0)
    e_uv = jnp.where(ok_r, e_uv, 0.0)
    e_vu = jnp.where(ok_r, e_vu, 0.0)
    e_vv = jnp.where(ok_r, e_vv, 0.0)

    blocks = jnp.zeros(nB * 128 * 128, dt)
    blocks = (blocks.at[base].add(e_uu)
                    .at[base + 1].add(e_uv)
                    .at[base + 128].add(e_vu)
                    .at[base + 129].add(e_vv))
    # per-row diagonal terms: -beta_eff on free rows (operator diagonals
    # are already in the scatter), BC diagonal on constrained rows,
    # identity on block-padding rows (keeps every column nonsingular)
    pad = lambda a, fill: jnp.full(nB * B, fill, a.dtype).at[:nTri].set(a)
    freep = pad(bc_free, False) & row_valid
    if front is not None:
        is_front, off, _, _ = front
        freep = (pad(bc_free | is_front, False) & ~pad(off, True)) \
            & row_valid
    betap = pad(beta_eff_b.astype(dt), 0.0)
    nnbrp = pad(n_nbr, 1.0)
    d_uu = jnp.where(freep, -betap,
                     jnp.where(pad(bc_inf_u, False), -nnbrp, 1.0))
    d_vv = jnp.where(freep, -betap,
                     jnp.where(pad(bc_inf_v, False), -nnbrp, 1.0))
    # front rows have no diagonal beta term
    if front is not None:
        frp = pad(front[0], False) & row_valid
        d_uu = jnp.where(frp, 0.0, d_uu)
        d_vv = jnp.where(frp, 0.0, d_vv)
    blocks = blocks.at[diag].add(d_uu).at[diag + 129].add(d_vv)
    Minv = jnp.linalg.inv(blocks.reshape(nB, 128, 128))

    def M(r):
        ru, rv = r
        rp = jnp.zeros((nB * B, 2), dt).at[:nTri].set(
            jnp.stack([ru, rv], axis=-1))
        yb = jnp.einsum("bij,bj->bi", Minv, rp.reshape(nB, 128),
                        preferred_element_type=dt)
        y = yb.reshape(nB * B, 2)[:nTri]
        return y[:, 0], y[:, 1]
    return M


C2_BLOCK = 64    # triangles per coarse aggregate (two-level preconditioner)


def register_two_level_static(mesh, md: MeshData):
    """Static tables for the two-level preconditioner: piecewise-constant
    aggregates of C2_BLOCK Morton-contiguous triangles, and the
    block-column structure of S_k = M_k @ P for the 5 shared-pattern
    b-grid operators. The Galerkin coarse operator A_c = P^T A P is then
    assembled ON DEVICE each viscosity iteration from the same per-row
    weights as the matrix-free apply (make_A), LU-factored once, and its
    correction added to the 2x2 block-Jacobi. This is the TPU-native
    answer to the long-range near-null shelf modes that block-local
    preconditioners cannot reach (PERF_NOTES round 3): the coarse solve
    is a dense [2nB, 2nB] LU on the MXU. Reference strength class:
    PETSc KSP with composite/fieldsplit preconditioning
    (src/UPSY/basic/petsc_basic.f90).

    Single-device only (tables live in row x block-col space, which the
    dist layer does not shard; the sharded path falls back to 2x2 BJ)."""
    if "c2_bcol" in md.extras:
        return
    import scipy.sparse as sp
    ops = mesh.operators
    mats = [ops.M2_ddx_b_b.tocsr(), ops.M2_ddy_b_b.tocsr(),
            ops.M2_d2dx2_b_b.tocsr(), ops.M2_d2dxdy_b_b.tocsr(),
            ops.M2_d2dy2_b_b.tocsr()]
    nTri = mats[0].shape[0]
    B = C2_BLOCK
    nB = (nTri + B - 1) // B
    blk = np.arange(nTri) // B
    # prolongation columns masked to statically-free rows: the coarse
    # correction is zero on BC rows, so their columns must not enter the
    # Galerkin product (Dirichlet-consistent restriction). The dynamic
    # off-ice mask of the ocean-pressure variant cannot be baked in here;
    # those columns stay and merely soften the preconditioner.
    free = np.asarray(md.x("ssa_bc_free"))
    P = sp.csr_matrix((free.astype(np.float64), (np.arange(nTri), blk)),
                      shape=(nTri, nB))
    P.eliminate_zeros()
    Sk = [(m @ P).tocsr() for m in mats]
    U = sum(abs(s) for s in Sk).tocsr()
    U.sum_duplicates()
    U.sort_indices()
    counts = np.diff(U.indptr)
    KB = max(int(counts.max()), 1)
    bcol = np.zeros((nTri, KB), np.int32)
    vals5 = np.zeros((nTri, KB, 5))
    row_of = np.repeat(np.arange(nTri), counts)
    pos = np.arange(U.nnz) - np.repeat(U.indptr[:-1], counts)
    bcol[row_of, pos] = U.indices
    valid = np.zeros((nTri, KB), bool)
    valid[row_of, pos] = True
    for k, s in enumerate(Sk):
        sc = s.tocoo()
        # position of (row, col) inside the union row
        key = sc.row.astype(np.int64) * nB + sc.col
        ukey = row_of.astype(np.int64) * nB + bcol[row_of, pos]
        order = np.argsort(ukey)
        loc = np.searchsorted(ukey[order], key)
        vals5[row_of[order][loc], pos[order][loc], k] = sc.data
    dt = md.A.dtype
    md.extras.update({
        "c2_blk": EField(jnp.asarray(blk, jnp.int32), "C2row"),
        "c2_bcol": EField(jnp.asarray(bcol, jnp.int32), "C2nnz"),
        "c2_vals5": EField(jnp.asarray(vals5, dt), "C2nnz"),
        "c2_valid": EField(jnp.asarray(valid), "C2nnz"),
    })


def make_precond_two_level(md, N_b, dN_dx_b, dN_dy_b, beta_eff_b,
                           front=None):
    """2x2 block-Jacobi + additive piecewise-constant coarse correction:
    z = BJ(r) + P A_c^{-1} P^T r restricted to free rows. A_c is the
    Galerkin coarse operator assembled from the make_A row weights."""
    import jax
    Mbj = make_precond(md, N_b, dN_dx_b, dN_dy_b, beta_eff_b, front=front)
    bc_free = md.x("ssa_bc_free")
    blk = md.x("c2_blk")
    bcol = md.x("c2_bcol")
    vals5 = md.x("c2_vals5")
    valid = md.x("c2_valid")
    nTri = N_b.shape[0]
    # nB from static shapes (md attributes do not survive pytree
    # unflattening inside jit)
    nB = (blk.shape[0] + C2_BLOCK - 1) // C2_BLOCK
    dt = N_b.dtype

    if front is not None:
        is_front, off, n_x, n_y = front
        ok = (bc_free | is_front) & ~off
    else:
        is_front = jnp.zeros(nTri, bool)
        n_x = n_y = jnp.zeros(nTri, dt)
        ok = bc_free

    # per-row weights of the 5 operators in each (u,v) coupling
    # (make_A interior rows; front rows use the Neumann weights)
    zero = jnp.zeros(nTri, dt)
    def _w(interior, front_w):
        w = jnp.where(ok, interior, 0.0)
        if front is not None:
            w = jnp.where(is_front & ~off, front_w, w)
        return w
    w_uu = [_w(4 * dN_dx_b, 4 * N_b * n_x), _w(dN_dy_b, N_b * n_y),
            _w(4 * N_b, zero), _w(zero, zero), _w(N_b, zero)]
    w_uv = [_w(dN_dy_b, N_b * n_y), _w(2 * dN_dx_b, 2 * N_b * n_x),
            _w(zero, zero), _w(3 * N_b, zero), _w(zero, zero)]
    w_vu = [_w(2 * dN_dy_b, 2 * N_b * n_y), _w(dN_dx_b, N_b * n_x),
            _w(zero, zero), _w(3 * N_b, zero), _w(zero, zero)]
    w_vv = [_w(dN_dx_b, N_b * n_x), _w(4 * dN_dy_b, 4 * N_b * n_y),
            _w(N_b, zero), _w(zero, zero), _w(4 * N_b, zero)]

    n2 = 2 * nB
    Ac = jnp.zeros(n2 * n2, dt)
    base = (2 * blk)[:, None] * n2 + 2 * bcol          # [nTri, KB]
    vm = jnp.where(valid, 1.0, 0.0).astype(dt)
    for (a, b, ws) in ((0, 0, w_uu), (0, 1, w_uv),
                       (1, 0, w_vu), (1, 1, w_vv)):
        e = sum(ws[k][:, None] * vals5[:, :, k] for k in range(5)) * vm
        Ac = Ac.at[(base + a * n2 + b).ravel()].add(e.ravel())
    # diagonal beta on free interior rows (front rows carry no beta)
    beta_free = jnp.where(bc_free & ~is_front, -beta_eff_b.astype(dt), 0.0)
    dsum = jnp.zeros(nB, dt).at[blk].add(beta_free)
    diag = (2 * jnp.arange(nB)) * n2 + 2 * jnp.arange(nB)
    Ac = Ac.at[diag].add(dsum).at[diag + n2 + 1].add(dsum)
    # non-free rows are excluded from the coarse residual/prolongation;
    # keep their aggregates nonsingular with an identity contribution
    nfree = jnp.zeros(nB, dt).at[blk].add(jnp.where(ok, 0.0, 1.0))
    Ac = Ac.at[diag].add(nfree).at[diag + n2 + 1].add(nfree)
    # dense inverse, not LU: jnp.linalg.inv is the factorisation route
    # proven stable on the remote TPU worker (the dense block-Jacobi
    # preconditioner batch-inverts with it, PERF_NOTES round 3), and the
    # coarse apply then fuses into one matvec per iteration
    Ac_inv = jnp.linalg.inv(Ac.reshape(n2, n2))

    def M(r):
        ru, rv = r
        zu, zv = Mbj(r)
        rc = jnp.zeros(n2, dt) \
            .at[2 * blk].add(jnp.where(ok, ru, 0.0)) \
            .at[2 * blk + 1].add(jnp.where(ok, rv, 0.0))
        zc = Ac_inv @ rc
        zu = zu + jnp.where(ok, zc[2 * blk], 0.0)
        zv = zv + jnp.where(ok, zc[2 * blk + 1], 0.0)
        return zu, zv
    return M


def make_precond(md, N_b, dN_dx_b, dN_dy_b, beta_eff_b, front=None):
    """2x2 block-Jacobi: invert the per-triangle (u,v) diagonal block."""
    bc_free = md.x("ssa_bc_free")
    bc_inf_u = md.x("ssa_bc_inf_u")
    bc_inf_v = md.x("ssa_bc_inf_v")
    n_nbr = md.mask_TriC.sum(axis=1).astype(N_b.dtype)
    d_ddx = md.x("ssa_d_ddx")
    d_ddy = md.x("ssa_d_ddy")
    d_dxx = md.x("ssa_d_dxx")
    d_dxy = md.x("ssa_d_dxy")
    d_dyy = md.x("ssa_d_dyy")
    auu = (4 * N_b * d_dxx + 4 * dN_dx_b * d_ddx
           + N_b * d_dyy + dN_dy_b * d_ddy - beta_eff_b)
    auv = 3 * N_b * d_dxy + 2 * dN_dx_b * d_ddy + dN_dy_b * d_ddx
    avu = 3 * N_b * d_dxy + 2 * dN_dy_b * d_ddx + dN_dx_b * d_ddy
    avv = (4 * N_b * d_dyy + 4 * dN_dy_b * d_ddy
           + N_b * d_dxx + dN_dx_b * d_ddx - beta_eff_b)
    # BC rows: diagonal is 1 (zero/periodic) or -n (infinite)
    auu = jnp.where(bc_free, auu, jnp.where(bc_inf_u, -n_nbr, 1.0))
    avv = jnp.where(bc_free, avv, jnp.where(bc_inf_v, -n_nbr, 1.0))
    auv = jnp.where(bc_free, auv, 0.0)
    avu = jnp.where(bc_free, avu, 0.0)
    if front is not None:
        is_front, off, n_x, n_y = front
        auu_f = 4 * N_b * n_x * d_ddx + N_b * n_y * d_ddy
        avv_f = 4 * N_b * n_y * d_ddy + N_b * n_x * d_ddx
        auv_f = 2 * N_b * n_x * d_ddy + N_b * n_y * d_ddx
        avu_f = 2 * N_b * n_y * d_ddx + N_b * n_x * d_ddy
        auu = jnp.where(off, 1.0, jnp.where(is_front, auu_f, auu))
        avv = jnp.where(off, 1.0, jnp.where(is_front, avv_f, avv))
        auv = jnp.where(off, 0.0, jnp.where(is_front, auv_f, auv))
        avu = jnp.where(off, 0.0, jnp.where(is_front, avu_f, avu))
    det = auu * avv - auv * avu
    det = jnp.where(jnp.abs(det) < 1e-300, 1e-300, det)

    def M(r):
        ru, rv = r
        return ((avv * ru - auv * rv) / det,
                (-avu * ru + auu * rv) / det)
    return M


# ---------------------------------------------------------------------------
# The solver factory
# ---------------------------------------------------------------------------

class _ViscCarry(NamedTuple):
    u: jnp.ndarray
    v: jnp.ndarray
    u_base: jnp.ndarray
    v_base: jnp.ndarray
    tau_bx: jnp.ndarray
    tau_by: jnp.ndarray
    eta_3D_b: jnp.ndarray
    beta_b_a: jnp.ndarray       # a-grid friction coefficient
    F1_3D_b: jnp.ndarray
    F2_b1: jnp.ndarray          # F2 at base on b-grid
    relax: jnp.ndarray
    eps_sq0: jnp.ndarray
    L2: jnp.ndarray
    n_diverg: jnp.ndarray
    it: jnp.ndarray
    n_axb: jnp.ndarray
    done: jnp.ndarray


def register_ssadiva_static(C, mesh, md: MeshData):
    """Register the SSA/DIVA static per-triangle tables (BC row masks,
    fixed-row copy tables, preconditioner diagonals) into md.extras so
    they travel with the md pytree into (sharded) jitted steps."""
    if "ssa_bc_free" in md.extras:
        return
    bc = make_bc_data(C, mesh)
    dt = md.A.dtype
    ef = lambda a: EField(jnp.asarray(a), "Tri")
    md.extras.update({
        "ssa_bc_free": ef(bc.free),
        "ssa_bc_zero_u": ef(bc.zero_u), "ssa_bc_zero_v": ef(bc.zero_v),
        "ssa_bc_inf_u": ef(bc.inf_u), "ssa_bc_inf_v": ef(bc.inf_v),
        "ssa_bc_fix_u": ef(bc.fix_u), "ssa_bc_fix_v": ef(bc.fix_v),
        "ssa_copy_inds": EIndex(jnp.asarray(bc.copy_inds, jnp.int32),
                                "Tri", "Tri"),
        "ssa_copy_w": EField(jnp.asarray(bc.copy_w, dt), "Tri"),
    })
    ops = mesh.operators
    for name, M in [("ssa_d_ddx", ops.M2_ddx_b_b), ("ssa_d_ddy", ops.M2_ddy_b_b),
                    ("ssa_d_dxx", ops.M2_d2dx2_b_b),
                    ("ssa_d_dxy", ops.M2_d2dxdy_b_b),
                    ("ssa_d_dyy", ops.M2_d2dy2_b_b)]:
        md.extras[name] = EField(jnp.asarray(M.diagonal(), dt), "Tri")
    md.ssa_has_fix = bool(bc.fix_u.any() or bc.fix_v.any())
    precond_choice = getattr(C, "tpu_stress_balance_precond", "")
    if precond_choice == "block_dense":
        # nnz-space tables: single-device only (see register_bjdense_static)
        register_bjdense_static(mesh, md)
    elif precond_choice == "two_level":
        register_two_level_static(mesh, md)

    from .sliding import register_sliding_static
    register_sliding_static(C, mesh, md)


def make_solve_ssa_diva(C, md: MeshData, choice: str, bedrock_cdfs=None):
    """Build the stress-balance solve function for SSA / DIVA / SIA+SSA.

    Returned fn(Hi, Hs, Hb, SL, Ti, s) ->
      (u_vav_b, v_vav_b, u_3D_b, v_3D_b, n_visc_its, n_Axb_its).

    All per-entity static data lives in md.extras (registered above), so
    the returned solve() works both on the full mesh and as the body of a
    shard_map over the device mesh (md then holds per-device local blocks
    with halo tables).
    """
    is_diva = choice == "DIVA"
    with_sia = choice == "SIA/SSA"
    precond_kind = getattr(C, "tpu_stress_balance_precond", "block_jacobi")
    precond_deg = int(getattr(C, "tpu_stress_balance_precond_degree", 5))
    krylov_restart = int(getattr(C, "tpu_stress_balance_krylov_restart", 60))
    ocean_pressure = getattr(C, "BC_ice_front", "infinite_slab") \
        == "ocean_pressure"
    n_glen = C.Glens_flow_law_exponent
    no_sliding = C.choice_sliding_law == "no_sliding"
    if "ssa_bc_free" not in md.extras:
        register_ssadiva_static(C, md._host_mesh, md)
    has_fix = md.ssa_has_fix
    from .subgrid import register_bedrock_cdfs
    register_bedrock_cdfs(md, bedrock_cdfs)

    if not is_diva and no_sliding:
        # Pure SSA (or the SSA part of SIA/SSA) with no sliding: the SSA
        # velocity is identically zero and the reference skips the solve
        # entirely (SSA_main.f90:125-130). Solving with beta = 0 instead
        # would be a free-slip membrane - unbounded velocities.
        def solve_no_slip(md, Hi, Hs, Hb, SL, Ti, s):
            nz = md.nz
            z_b = jnp.zeros(md.nTri, md.A.dtype)
            z3 = jnp.zeros((md.nTri, nz), md.A.dtype)
            u_vav, v_vav, u_3D, v_3D = z_b, z_b, z3, z3
            if with_sia:
                masks = determine_masks(md, Hi, Hb, SL)
                A_flow = calc_ice_rheology_glen(
                    C, md, Hi, Hs, Ti, masks["mask_grounded_ice"],
                    masks["mask_floating_ice"])
                u3s, v3s, _, _, _, uvs, vvs = sia_mod.solve_SIA(
                    C, md, Hi, Hs, A_flow)
                u_vav, v_vav = u_vav + uvs, v_vav + vvs
                u_3D, v_3D = u_3D + u3s, v_3D + v3s
            aux = {"visc_tau_bx": s.visc_tau_bx,
                   "visc_tau_by": s.visc_tau_by,
                   "visc_eta_3D_b": s.visc_eta_3D_b}
            return (u_vav, v_vav, u_3D, v_3D, jnp.int32(0), jnp.int32(0),
                    aux)
        return solve_no_slip

    def solve(md, Hi, Hs, Hb, SL, Ti, s):
        # md is the RUNTIME MeshData pytree (a jit argument,
        # not a closure constant): keeps the big operator
        # arrays out of the compiled graph's constant pool.
        zeta = md.zeta
        nz = md.nz
        bc_free = md.x("ssa_bc_free")
        bc_fix_u = md.x("ssa_bc_fix_u")
        bc_fix_v = md.x("ssa_bc_fix_v")
        masks = determine_masks(md, Hi, Hb, SL)
        A_flow = calc_ice_rheology_glen(C, md, Hi, Hs, Ti,
                                        masks["mask_grounded_ice"],
                                        masks["mask_floating_ice"])
        fraction_gr, fraction_gr_b = calc_grounded_fractions(
            C, md, Hi, Hb, SL, masks["mask_floating_ice"], dHb=s.dHb)
        Hi_eff, _ = calc_effective_thickness(md, Hi, Hb, SL)
        # geometry gradients at FULL accuracy (ops.sparse.exact_mv:
        # bf16-rounded Hs is ~1e-3 absolute slope noise)
        Hs_slope = jnp.sqrt(md.M_ddx_a_a.exact_matvec(Hs) ** 2
                            + md.M_ddy_a_a.exact_matvec(Hs) ** 2)

        # driving stress (SSA_DIVA_utilities.f90:24)
        Hi_b = md.M_map_a_b.exact_matvec(Hi)
        tau_dx_b = (-ice_density * grav * Hi_b
                    * md.M_ddx_a_b.exact_matvec(Hs))
        tau_dy_b = (-ice_density * grav * Hi_b
                    * md.M_ddy_a_b.exact_matvec(Hs))

        # ocean-pressure variant (BC_ice_front='ocean_pressure',
        # DIVA_solver_ocean_pressure.f90): the reference solves on a
        # masked ice-only graph with Neumann ocean-back-pressure rows at
        # the calving front; here the same system is expressed as masked
        # rows on the full mesh (identity rows off the ice)
        front = None
        tau_ox_b = tau_oy_b = None
        if ocean_pressure:
            ice_a = md.ext_V(Hi > 0.1)
            ice_b = ice_a[md.Tri].any(axis=1)
            ice_nbr = md.ext_Tri(ice_b)[md.TriC]
            noice_nbr = (~ice_nbr) & md.mask_TriC
            is_front = ice_b & noice_nbr.any(axis=1)
            off = ~ice_b
            # outward normal: towards the mean of the ice-free neighbour
            # centroids (graph border_nhat equivalent)
            gc_nbr = md.ext_Tri(md.TriGC)[md.TriC]    # [nTri,3,2]
            d = jnp.where(noice_nbr[:, :, None],
                          gc_nbr - md.TriGC[:, None, :], 0.0).sum(axis=1)
            d_len = jnp.sqrt((d ** 2).sum(axis=1))
            nhat = d / jnp.maximum(d_len, 1e-30)[:, None]
            n_x, n_y = nhat[:, 0], nhat[:, 1]
            front = (is_front, off, n_x, n_y)
            # ocean back pressure (calc_ocean_back_pressure:660-670):
            # Ho = min( max(SL - Hb, 0), rho_i/rho_sw * Hi )
            Ho_a = jnp.minimum(jnp.maximum(SL - Hb, 0.0),
                               ice_density / seawater_density * Hi)
            Ho_b = md.M_map_a_b @ Ho_a
            tau_mag = (0.5 * ice_density * grav * Hi_b ** 2
                       - 0.5 * seawater_density * grav * Ho_b ** 2)
            tau_ox_b = tau_mag * n_x
            tau_oy_b = tau_mag * n_y

        bed_roughness = _bed_roughness_fields(C, md, s.bed_roughness)
        V_host = getattr(md, "_host_mesh", None)
        V_host = V_host.V if V_host is not None else None

        Hi_reg = jnp.maximum(0.1, Hi)

        def body(c: _ViscCarry) -> _ViscCarry:
            # horizontal strain rates on the a-grid
            du_dx_a = md.M_ddx_b_a @ c.u
            du_dy_a = md.M_ddy_b_a @ c.u
            dv_dx_a = md.M_ddx_b_a @ c.v
            dv_dy_a = md.M_ddy_b_a @ c.v

            # vertical shear strain rates (DIVA only; Lipscomb 2019 Eq. 36)
            if is_diva:
                du_dz_b = (c.tau_bx[:, None] * zeta[None, :]
                           / jnp.maximum(C.visc_eff_min, c.eta_3D_b))
                dv_dz_b = (c.tau_by[:, None] * zeta[None, :]
                           / jnp.maximum(C.visc_eff_min, c.eta_3D_b))
                du_dz_a = md.M_map_b_a @ du_dz_b
                dv_dz_a = md.M_map_b_a @ dv_dz_b
            else:
                du_dz_a = jnp.zeros(A_flow.shape, A_flow.dtype)
                dv_dz_a = jnp.zeros(A_flow.shape, A_flow.dtype)

            # effective viscosity (Glen)
            A_min = 1e-18
            eta_max = 0.5 * A_min ** (-1.0 / n_glen) * \
                c.eps_sq0 ** ((1.0 - n_glen) / (2.0 * n_glen))
            eps_sq = (du_dx_a ** 2 + dv_dy_a ** 2 + du_dx_a * dv_dy_a
                      + 0.25 * (du_dy_a + dv_dx_a) ** 2)[:, None] \
                + 0.25 * (du_dz_a ** 2 + dv_dz_a ** 2) + c.eps_sq0
            eta_3D_a = 0.5 * A_flow ** (-1.0 / n_glen) * \
                eps_sq ** ((1.0 - n_glen) / (2.0 * n_glen))
            eta_3D_a = jnp.clip(eta_3D_a, C.visc_eff_min, eta_max)
            eta_3D_b = md.M_map_a_b @ eta_3D_a
            eta_vav_a = vertical_average(zeta, eta_3D_a, axis=-1)
            N_a = eta_vav_a * Hi_reg
            N_b = md.M_map_a_b @ N_a
            dN_dx_b = md.M_ddx_a_b @ N_a
            dN_dy_b = md.M_ddy_a_b @ N_a

            # F-integrals (Lipscomb 2019 Eq. 30) and effective friction
            if is_diva:
                F1_3D_a = -Hi_reg[:, None] * integrate_from_base_up(
                    jnp.broadcast_to(zeta, eta_3D_a.shape),
                    zeta[None, :] / eta_3D_a, axis=-1)
                F2_3D_a = -Hi_reg[:, None] * integrate_from_base_up(
                    jnp.broadcast_to(zeta, eta_3D_a.shape),
                    zeta[None, :] ** 2 / eta_3D_a, axis=-1)
                F1_3D_b = md.M_map_a_b @ F1_3D_a
                F2_b1 = (md.M_map_a_b @ F2_3D_a[:, 0])
                F2_a1 = F2_3D_a[:, 0]
            else:
                F1_3D_b = c.F1_3D_b
                F2_b1 = jnp.zeros_like(N_b)
                F2_a1 = jnp.zeros_like(N_a)

            # sliding law -> a-grid friction coefficient
            u_base_a = md.M_map_b_a @ c.u_base
            v_base_a = md.M_map_b_a @ c.v_base
            beta_b_a = calc_basal_friction_coefficient(
                C, md, bed_roughness, u_base_a, v_base_a, Hi, Hi_eff, Hb, SL,
                Hs_slope, fraction_gr, masks, V_host=V_host)

            if is_diva:
                if no_sliding:
                    beta_eff_a = 1.0 / jnp.maximum(F2_a1, 1e-30)
                else:
                    beta_eff_a = beta_b_a / (1.0 + beta_b_a * F2_a1)
            else:
                beta_eff_a = beta_b_a
            beta_eff_b = md.M_map_a_b @ beta_eff_a
            beta_b_b = md.M_map_a_b @ beta_b_a
            if C.do_GL_subgrid_friction:
                beta_eff_b = beta_eff_b * \
                    fraction_gr_b ** C.subgrid_friction_exponent_on_B_grid

            # linear solve (matrix-free GMRES)
            A = make_A(md, N_b, dN_dx_b, dN_dy_b, beta_eff_b, front=front)
            M = make_precond(md, N_b, dN_dx_b, dN_dy_b, beta_eff_b,
                             front=front)
            b_u = jnp.where(bc_free, -tau_dx_b, 0.0)
            b_v = jnp.where(bc_free, -tau_dy_b, 0.0)
            if front is not None:
                is_front, off, _, _ = front
                b_u = jnp.where(off, 0.0,
                                jnp.where(is_front, tau_ox_b, b_u))
                b_v = jnp.where(off, 0.0,
                                jnp.where(is_front, tau_oy_b, b_v))
            if has_fix:
                # fixed rows: relaxed weighted copy of the previous solution
                # (find_ti_copy_* BCs)
                copy_inds = md.x("ssa_copy_inds")
                copy_w = md.x("ssa_copy_w")
                u_fix = (copy_w * md.ext_Tri(c.u)[copy_inds]).sum(axis=1)
                v_fix = (copy_w * md.ext_Tri(c.v)[copy_inds]).sum(axis=1)
                u_fix = C.visc_it_relax * u_fix + (1 - C.visc_it_relax) * c.u
                v_fix = C.visc_it_relax * v_fix + (1 - C.visc_it_relax) * c.v
                b_u = jnp.where(bc_fix_u, u_fix, b_u)
                b_v = jnp.where(bc_fix_v, v_fix, b_v)
            # f32 floor: a relative residual below ~100*eps_f32 is not
            # reachable in single precision; the Picard loop tolerates the
            # looser inner solve (inexact-Newton argument)
            rtol = C.stress_balance_PETSc_rtol
            if dtype == jnp.float32:
                rtol = max(rtol, 1e-5)
            # polynomial acceleration of the 2x2 block-Jacobi base: the
            # membrane operator on shelf-dominated states (beta_eff -> 0)
            # stagnates plain BJ-GMRES (measured 1000+ its/solve on the
            # MISMIP+ slab); a degree-k Chebyshev over BJ cuts iteration
            # counts ~5x for k A-applies per application. The reference
            # gets equivalent robustness from PETSc's ILU class, which
            # does not vectorise on TPU.
            if precond_kind == "chebyshev":
                lam = estimate_lambda_max(lambda w: M(A(w)), (b_u, b_v),
                                          n_its=10)
                Mp = make_chebyshev_preconditioner(A, M, precond_deg, lam)
            elif precond_kind == "neumann":
                Mp = make_neumann_preconditioner(A, M, precond_deg)
            elif precond_kind == "block_dense" and "bjd_vals" in md.extras:
                Mp = make_precond_dense(md, N_b, dN_dx_b, dN_dy_b,
                                        beta_eff_b, front=front)
            elif precond_kind == "two_level" and "c2_bcol" in md.extras:
                Mp = make_precond_two_level(md, N_b, dN_dx_b, dN_dy_b,
                                            beta_eff_b, front=front)
            else:
                Mp = M
            res = gmres(A, (b_u, b_v), x0=(c.u, c.v), M=Mp,
                        rtol=rtol,
                        abstol=C.stress_balance_PETSc_abstol,
                        restart=krylov_restart)
            u_new, v_new = res.x

            # velocity limits + relaxation
            speed = jnp.sqrt(u_new ** 2 + v_new ** 2)
            lim = jnp.where(speed > C.vel_max, C.vel_max / speed, 1.0)
            u_new, v_new = u_new * lim, v_new * lim
            u_new = c.relax * u_new + (1 - c.relax) * c.u
            v_new = c.relax * v_new + (1 - c.relax) * c.v

            # basal velocities + stress
            if is_diva:
                if no_sliding:
                    u_base = jnp.zeros_like(u_new)
                    v_base = jnp.zeros_like(v_new)
                else:
                    u_base = u_new / (1.0 + beta_b_b * F2_b1)
                    v_base = v_new / (1.0 + beta_b_b * F2_b1)
                tau_bx = u_new * beta_eff_b
                tau_by = v_new * beta_eff_b
            else:
                u_base, v_base = u_new, v_new
                tau_bx = u_new * beta_eff_b
                tau_by = v_new * beta_eff_b

            # convergence: L2 norm of change (calc_L2_norm_uv); global
            # sums so all devices agree on the iteration control flow
            res1 = comm.sum_all((u_new - c.u) ** 2 + (v_new - c.v) ** 2)
            res2 = comm.sum_all((u_new + c.u) ** 2 + (v_new + c.v) ** 2)
            L2 = 2.0 * res1 / jnp.maximum(res2, 1e-8)

            diverged = L2 > c.L2
            n_div = jnp.where(diverged, c.n_diverg + 1, 0)
            do_rescue = n_div > 2
            relax = jnp.where(do_rescue, c.relax * 0.9, c.relax)
            eps_sq0 = jnp.where(do_rescue, c.eps_sq0 * 1.2, c.eps_sq0)
            n_div = jnp.where(do_rescue, 0, n_div)

            converged = L2 < C.visc_it_norm_dUV_tol
            if os.environ.get("UF_VISC_DEBUG"):
                jax.debug.print(
                    "    visc it {it}: L2={L2:.3e} axb={na} conv={cv} "
                    "rnorm={rn:.3e} relax={rx:.3f} |u|max={um:.3e}",
                    it=c.it, L2=L2, na=res.n_iter, cv=res.converged,
                    rn=res.res_norm, rx=c.relax,
                    um=jnp.abs(u_new).max())
            return _ViscCarry(
                u=u_new, v=v_new, u_base=u_base, v_base=v_base,
                tau_bx=tau_bx, tau_by=tau_by, eta_3D_b=eta_3D_b,
                beta_b_a=beta_b_a, F1_3D_b=F1_3D_b, F2_b1=F2_b1,
                relax=relax, eps_sq0=eps_sq0, L2=L2, n_diverg=n_div,
                it=c.it + 1, n_axb=c.n_axb + res.n_iter, done=converged)

        def cond(c: _ViscCarry):
            # per-solve Krylov budget: a device-liveness valve (see
            # pc.py _AXB_STEP_BUDGET) - healthy solves use ~100-500 its
            return ((~c.done) & (c.it <= C.visc_it_nit)
                    & (c.n_axb < _AXB_SOLVE_BUDGET))

        dtype = md.A.dtype
        nTri = md.nTri
        init = _ViscCarry(
            u=s.u_vav_b, v=s.v_vav_b,
            # warm-start basal velocities from the stored 3-D profile
            # (base layer = u_base by the Lipscomb Eq. 29 reconstruction;
            # the reference keeps DIVA%u_base_b persistent). A zero init
            # makes the sliding law return enormous friction at it 0
            # (beta ~ |u|^(1/m - 1) -> inf), so the first solve of EVERY
            # step collapses the velocity field and the relax=0.2 loop
            # spends ~20 its recovering it.
            u_base=s.u_3D_b[:, -1], v_base=s.v_3D_b[:, -1],
            # warm-start the DIVA vertical-shear feedback from the
            # previous step's converged tau_b / eta (the reference keeps
            # these in the persistent DIVA solver state,
            # DIVA_solver_infinite_slab.f90 calc_vertical_shear_strain_
            # rates reads DIVA%tau_bx of the PREVIOUS solve): without it
            # iteration 0 sees du/dz = 0 and the relax=0.2 Picard loop
            # spends ~20 iterations re-converging the feedback EVERY step
            tau_bx=s.visc_tau_bx, tau_by=s.visc_tau_by,
            eta_3D_b=jnp.maximum(s.visc_eta_3D_b.astype(dtype),
                                 C.visc_eff_min),
            beta_b_a=jnp.zeros(md.nV, dtype),
            F1_3D_b=jnp.zeros((nTri, nz), dtype),
            F2_b1=jnp.zeros(nTri, dtype),
            relax=jnp.asarray(C.visc_it_relax, dtype),
            eps_sq0=jnp.asarray(C.Glens_flow_law_epsilon_sq_0, dtype),
            L2=jnp.asarray(1e9, dtype),
            n_diverg=jnp.asarray(0, jnp.int32),
            it=jnp.asarray(0, jnp.int32),
            n_axb=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False))
        out = jax.lax.while_loop(cond, body, init)

        # 3-D velocities (Lipscomb 2019 Eq. 29)
        if is_diva:
            beta_b_b = md.M_map_a_b @ out.beta_b_a
            if no_sliding:
                u_3D = out.tau_bx[:, None] * out.F1_3D_b
                v_3D = out.tau_by[:, None] * out.F1_3D_b
            else:
                u_3D = out.u_base[:, None] * (1.0 + beta_b_b[:, None]
                                              * out.F1_3D_b)
                v_3D = out.v_base[:, None] * (1.0 + beta_b_b[:, None]
                                              * out.F1_3D_b)
        else:
            u_3D = jnp.broadcast_to(out.u[:, None], (md.nTri, nz))
            v_3D = jnp.broadcast_to(out.v[:, None], (md.nTri, nz))

        u_vav, v_vav = out.u, out.v

        if with_sia:
            # hybrid SIA+SSA 'add' scheme (choice_hybrid_SIASSA_scheme)
            u3_sia, v3_sia, _, _, _, uv_sia, vv_sia = sia_mod.solve_SIA(
                C, md, Hi, Hs, A_flow)
            u_vav = u_vav + uv_sia
            v_vav = v_vav + vv_sia
            u_3D = u_3D + u3_sia
            v_3D = v_3D + v3_sia

        aux = {"visc_tau_bx": out.tau_bx, "visc_tau_by": out.tau_by,
               "visc_eta_3D_b": out.eta_3D_b}
        return (u_vav, v_vav, u_3D, v_3D, out.it, out.n_axb, aux)

    return solve


def _bed_roughness_fields(C, md: MeshData, generic=None):
    """Bed roughness fields per sliding law (reference bed_roughness
    model). `generic` is the (possibly nudged) per-vertex roughness
    parameter carried in IceState; when zero/None the uniform config
    values apply."""
    nV = md.nV
    dtype = md.A.dtype
    law = C.choice_sliding_law
    beta_sq = {"Weertman": C.slid_Weertman_beta_sq_uniform,
               "Tsai2015": C.slid_Tsai2015_beta_sq_uniform,
               "Schoof2005": C.slid_Schoof2005_beta_sq_uniform,
               }.get(law, C.slid_Weertman_beta_sq_uniform)
    phi = {"Coulomb": C.slid_Coulomb_phi_fric_uniform,
           "Budd": C.slid_Budd_phi_fric_uniform,
           "Zoet-Iverson": C.slid_ZI_phi_fric_uniform,
           }.get(law, C.slid_Budd_phi_fric_uniform)
    alpha_sq = {"Tsai2015": C.slid_Tsai2015_alpha_sq_uniform,
                "Schoof2005": C.slid_Schoof2005_alpha_sq_uniform,
                }.get(law, 0.5)
    beta_sq_f = jnp.full(nV, beta_sq, dtype)
    phi_f = jnp.full(nV, phi, dtype)
    if generic is not None:
        use = generic > 0
        if law in ("Weertman", "Tsai2015", "Schoof2005"):
            beta_sq_f = jnp.where(use, generic, beta_sq_f)
        else:
            phi_f = jnp.where(use, generic, phi_f)
    return {
        "beta_sq": beta_sq_f,
        "till_friction_angle": phi_f,
        "alpha_sq": jnp.full(nV, alpha_sq, dtype),
    }
