"""Device-resident mesh data: the pytree every kernel closes over.

Bridges the host-side Mesh (numpy, ragged) to TPU-friendly static-shape
jnp arrays: padded neighbour tables, ELL operators, border masks. This
replaces the reference's type_mesh-with-CSR-members carried through every
subroutine (mesh_types.f90); here it is an immutable pytree captured by
jitted step functions, so XLA constant-folds the connectivity.
"""

from __future__ import annotations

from dataclasses import dataclass, fields
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sparse import (EllMatrix, ell_from_csr, TiledEllMatrix,
                          TiledEllStack, tiled_from_csr,
                          tiled_stack_from_csr, grouped_stack_from_csr)


def _build_m2_stack(mats, dtype):
    """Flat tile slab by default. The T-grouped layout
    (grouped_stack_from_csr) reads ~2.4x less slab but its inverse-row
    gather defeated XLA's fusion in the round-2 (noisy-einsum) context;
    UF_M2_LAYOUT=grouped re-enables it for A/B runs (PERF_NOTES.md)."""
    import os
    if os.environ.get("UF_M2_LAYOUT") in ("grouped", "pallas"):
        return grouped_stack_from_csr(mats, dtype=dtype)
    return tiled_stack_from_csr(mats, dtype=dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class EField:
    """A static per-entity field registered in MeshData.extras.

    `row` names the entity space ('V' | 'Tri' | 'E') so the multi-chip
    builder (parallel/dist.py) knows how to pad and shard it."""
    arr: Any
    row: str

    def tree_flatten(self):
        return (self.arr,), (self.row,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


@jax.tree_util.register_pytree_node_class
@dataclass
class EIndex:
    """A static index table in MeshData.extras: rows in entity space
    `row`, values indexing entity space `col` (re-indexed to the
    extended-local column space by the multi-chip builder)."""
    arr: Any
    row: str
    col: str

    def tree_flatten(self):
        return (self.arr,), (self.row, self.col)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])


@jax.tree_util.register_pytree_node_class
@dataclass
class MeshData:
    # geometry
    V: Any          # [nV,2]
    TriGC: Any      # [nTri,2]
    A: Any          # [nV] Voronoi areas
    TriA: Any       # [nTri]
    R: Any          # [nV] resolution
    zeta: Any       # [nz]
    zeta_stag: Any  # [nz-1]

    # vertex connectivity (padded; pad entries point at 0 with mask False)
    C: Any          # [nV,K] int32 neighbour vertex
    mask_C: Any     # [nV,K] bool
    VE: Any         # [nV,K] int32 edge per connection
    Cw: Any         # [nV,K] shared Voronoi boundary length
    D_x: Any        # [nV,K]
    D_y: Any
    D: Any

    # triangles
    Tri: Any        # [nTri,3] int32 vertex indices

    # edges
    EV: Any         # [nE,2] int32
    ETri: Any       # [nE,2] int32 (pad -> 0)
    mask_ETri: Any  # [nE,2] bool

    # border
    VBI: Any        # [nV] int32
    border_N: Any   # [nV] bool (VBI 1,2)
    border_E: Any   # (3,4)
    border_S: Any   # (5,6)
    border_W: Any   # (7,8)

    # operators (ELL)
    M_ddx_a_a: EllMatrix
    M_ddy_a_a: EllMatrix
    M_map_a_b: EllMatrix
    M_ddx_a_b: EllMatrix
    M_ddy_a_b: EllMatrix
    M_map_b_a: EllMatrix
    M_ddx_b_a: EllMatrix
    M_ddy_b_a: EllMatrix
    M_ddx_b_b: EllMatrix
    M_ddy_b_b: EllMatrix
    M2_ddx_b_b: EllMatrix
    M2_ddy_b_b: EllMatrix
    M2_d2dx2_b_b: EllMatrix
    M2_d2dxdy_b_b: EllMatrix
    M2_d2dy2_b_b: EllMatrix

    # fused 2nd-order operator stack (f32/tiled mode only; None on f64)
    M2_stack: Any = None

    # extra static connectivity (shared by solvers)
    TriC: Any = None        # [nTri,3] int32 neighbour triangles (pad 0)
    mask_TriC: Any = None   # [nTri,3] bool
    E_len: Any = None       # [nE] edge lengths |V[vi]-V[vj]|
    rev_pos: Any = None     # [nV,K] position of vi within C[C[vi,k]]

    # registered static per-entity fields (EField/EIndex), keyed by name;
    # solver factories register here so the arrays ride the md pytree into
    # (sharded) jitted steps instead of being baked as closure constants
    extras: Any = None

    # multi-chip halo tables per entity space (None on a single device)
    halo_V: Any = None
    halo_Tri: Any = None
    halo_E: Any = None

    def tree_flatten(self):
        fs = fields(self)
        return tuple(getattr(self, f.name) for f in fs), tuple(f.name for f in fs)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(**dict(zip(aux, children)))

    # -- distributed-mode hooks ---------------------------------------------
    # On a single device these are identity; when halo tables are set (the
    # md is a per-device local view inside shard_map) they extend the local
    # block with halo values so gathers/SpMVs reading the re-indexed
    # extended-local column space stay device-local.

    def ext_V(self, x):
        if self.halo_V is None:
            return x
        from ..parallel.comm import halo_extend
        return halo_extend(x, self.halo_V)

    def ext_Tri(self, x):
        if self.halo_Tri is None:
            return x
        from ..parallel.comm import halo_extend
        return halo_extend(x, self.halo_Tri)

    def ext_E(self, x):
        if self.halo_E is None:
            return x
        from ..parallel.comm import halo_extend
        return halo_extend(x, self.halo_E)

    def x(self, name):
        """Registered extra field/table array by name."""
        return self.extras[name].arr

    @property
    def nV(self):
        return self.V.shape[0]

    @property
    def nTri(self):
        return self.TriGC.shape[0]

    @property
    def nE(self):
        return self.EV.shape[0]

    @property
    def nz(self):
        return self.zeta.shape[0]


def build_mesh_data(mesh, dtype=None) -> MeshData:
    """Construct device MeshData from a host Mesh (builds operators if
    absent)."""
    if mesh.operators is None:
        from ..mesh.operators import build_all_matrix_operators
        mesh.operators = build_all_matrix_operators(mesh)
    ops = mesh.operators

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    f = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)
    i = lambda a: jnp.asarray(np.asarray(a), dtype=jnp.int32)

    _host_mesh = mesh  # kept for solver factories needing host-side data

    mask_C = mesh.C >= 0
    C = np.where(mask_C, mesh.C, 0)
    VE = np.where(mesh.VE >= 0, mesh.VE, 0)
    mask_ETri = mesh.ETri >= 0
    ETri = np.where(mask_ETri, mesh.ETri, 0)
    mask_TriC = mesh.TriC >= 0
    TriC = np.where(mask_TriC, mesh.TriC, 0)
    E_len = np.linalg.norm(mesh.V[mesh.EV[:, 0]] - mesh.V[mesh.EV[:, 1]],
                           axis=1)
    # reverse-connection positions: rev_pos[vi,k] = index of vi within
    # C[C[vi,k]] (valid because mesh connections are symmetric); static
    # connectivity, so computed once here instead of per step on device
    CC = C[C].astype(np.int32)                    # [nV,K,K]
    rev_pos = np.argmax(
        CC == np.arange(mesh.nV, dtype=np.int32)[:, None, None],
        axis=2).astype(np.int32)
    del CC

    vbi = mesh.VBI
    # f32 (performance mode): tile-blocked operators - dense per-tile
    # contractions instead of element gathers (16-30x faster on TPU).
    # f64 (parity mode): gather-ELL (f64 einsum is emulated and slow).
    use_tiled = dtype == jnp.float32
    if use_tiled:
        e = lambda A: tiled_from_csr(A, dtype=dtype)
    else:
        e = lambda A: ell_from_csr(A, dtype=dtype)

    md = MeshData(
        V=f(mesh.V), TriGC=f(mesh.TriGC), A=f(mesh.A), TriA=f(mesh.TriA),
        R=f(mesh.R), zeta=f(mesh.zeta), zeta_stag=f(mesh.zeta_stag),
        C=i(C), mask_C=jnp.asarray(mask_C), VE=i(VE),
        Cw=f(np.where(mask_C, mesh.Cw, 0.0)),
        D_x=f(mesh.D_x), D_y=f(mesh.D_y), D=f(mesh.D),
        Tri=i(mesh.Tri),
        EV=i(mesh.EV), ETri=i(ETri), mask_ETri=jnp.asarray(mask_ETri),
        VBI=i(vbi),
        border_N=jnp.asarray((vbi == 1) | (vbi == 2)),
        border_E=jnp.asarray((vbi == 3) | (vbi == 4)),
        border_S=jnp.asarray((vbi == 5) | (vbi == 6)),
        border_W=jnp.asarray((vbi == 7) | (vbi == 8)),
        M_ddx_a_a=e(ops.M_ddx_a_a), M_ddy_a_a=e(ops.M_ddy_a_a),
        M_map_a_b=e(ops.M_map_a_b), M_ddx_a_b=e(ops.M_ddx_a_b),
        M_ddy_a_b=e(ops.M_ddy_a_b),
        M_map_b_a=e(ops.M_map_b_a), M_ddx_b_a=e(ops.M_ddx_b_a),
        M_ddy_b_a=e(ops.M_ddy_b_a),
        M_ddx_b_b=e(ops.M_ddx_b_b), M_ddy_b_b=e(ops.M_ddy_b_b),
        M2_ddx_b_b=e(ops.M2_ddx_b_b), M2_ddy_b_b=e(ops.M2_ddy_b_b),
        M2_d2dx2_b_b=e(ops.M2_d2dx2_b_b),
        M2_d2dxdy_b_b=e(ops.M2_d2dxdy_b_b),
        M2_d2dy2_b_b=e(ops.M2_d2dy2_b_b),
        M2_stack=(_build_m2_stack(
            [ops.M2_ddx_b_b, ops.M2_ddy_b_b, ops.M2_d2dx2_b_b,
             ops.M2_d2dxdy_b_b, ops.M2_d2dy2_b_b], dtype)
            if use_tiled else None),
        TriC=i(TriC), mask_TriC=jnp.asarray(mask_TriC),
        E_len=f(E_len), rev_pos=jnp.asarray(rev_pos),
        extras={},
    )
    md._host_mesh = _host_mesh
    return md


# -- common neighbour-gather helpers ----------------------------------------

def gather_neighbours(md: MeshData, x):
    """x[C] with padding masked to 0; x is [nV] or [nV, d]."""
    g = md.ext_V(x)[md.C]
    m = md.mask_C if g.ndim == 2 else md.mask_C[..., None]
    return jnp.where(m, g, 0)


def map_b_to_c(md: MeshData, u_b):
    """b-grid (triangles) -> c-grid (edges) velocity mapping.

    Mean of the two adjacent triangles; one-sided at border edges
    (reference map_velocities_from_b_to_c_2D, map_velocities_to_c_grid.f90:44).
    """
    vals = md.ext_Tri(u_b)[md.ETri]           # [nE,2] or [nE,2,d]
    m = md.mask_ETri
    if vals.ndim == 3:
        m = m[..., None]
    s = jnp.where(m, vals, 0).sum(axis=1)
    n = m.sum(axis=1)
    return s / jnp.maximum(n, 1)
