"""Multi-chip distribution of the full model step (phase 3).

TPU-native equivalent of the reference's distributed-memory layer
(src/UPSY/basic/mpi_parallelisation/ + mesh_parallelisation.f90): the three
mesh entity spaces (vertices, triangles, edges) are split into P contiguous
equal blocks (padded), every operator and connectivity table is re-indexed
into each device's *extended local* column space [owned ; halo], and halo
tables are precomputed from the union of all cross-block references - the
reference's type_par_arr_info halo ranges, generalised to arbitrary
(row-space -> col-space) references.

The converted MeshData has the same field names as the single-device one,
so the physics code (pc step, DIVA viscosity iteration, Krylov solvers,
mass conservation) runs unchanged as the body of a shard_map over a 1-D
jax.sharding.Mesh: gathers go through md.ext_V/ext_Tri/ext_E (one
all_gather of the small send buffers over ICI), reductions through
parallel.comm (psum/pmax/pmin). This is the fake-node multinode pattern of
mpi_basic.f90:78-129 made real: the same program runs on 8 virtual CPU
devices in tests and on TPU slices in production.
"""

from __future__ import annotations

from dataclasses import dataclass, fields as dc_fields
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.mesh_data import MeshData, EField, EIndex
from ..ops.sparse import EllMatrix, ell_spmv, _maybe_split
from . import comm
from .comm import HaloTables
from .sharding import MESH_AXIS, make_device_mesh


# ---------------------------------------------------------------------------
# Distributed operators
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class DistEllMatrix:
    """Extended-local ELL operator + its column-space halo tables.

    Arrays are stored with all devices' rows concatenated ([P*nLr, K],
    tables [P*Hs]/[P*Hh]); passed through shard_map with the leading axis
    sharded, each device sees exactly its own slice, and `M @ x` performs
    the halo exchange + local SpMV."""

    inds: Any           # [P*nLr, K] extended-local column indices
    vals: Any           # [P*nLr, K]
    halo: HaloTables    # column-space tables (flat, device-major)
    n_cols: int         # extended local length nLc + Hh (static)

    def __matmul__(self, x):
        x_ext = comm.halo_extend(x, self.halo)
        return ell_spmv(self.inds, self.vals, x_ext)

    def exact_matvec(self, x):
        """Full-accuracy apply for geometry fields (ops.sparse._contract)."""
        x_ext = comm.halo_extend(x, self.halo)
        return ell_spmv(self.inds, self.vals, x_ext, exact=True)

    def tree_flatten(self):
        return (self.inds, self.vals, self.halo), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])


@jax.tree_util.register_pytree_node_class
@dataclass
class DistEllStack:
    """Stack of operators sharing one sparsity pattern and ONE halo
    exchange (the five M2_* b-grid operators of the DIVA hot path)."""

    inds: Any           # [P*nLr, K] union-structure indices
    vals: Any           # [P*nLr, K, n_ops]
    halo: HaloTables
    n_cols: int

    def apply(self, x):
        """x local [nLc(,d)] -> [n_ops, nLr(,d)]."""
        x_ext = comm.halo_extend(x, self.halo)
        g = x_ext[self.inds]                     # [nLr, K(, d)]
        sub = "rko,rk->or" if g.ndim == 2 else "rko,rkd->ord"
        if isinstance(self.vals, tuple):
            # split-bf16 slab (hi, lo): the SAME arithmetic as the
            # single-device grouped stack (_contract, UF_X_SPLIT='none'),
            # so sharded f32 trajectories match single-device to f32
            # accumulation order (VERDICT r3 item 8) and the einsums hit
            # the MXU exactly on real TPUs.
            hi, lo = self.vals
            gh = g.astype(jnp.bfloat16)
            f32 = jnp.float32
            return (jnp.einsum(sub, hi, gh, preferred_element_type=f32)
                    + jnp.einsum(sub, lo, gh, preferred_element_type=f32))
        return jnp.einsum(sub, self.vals, g)

    def tree_flatten(self):
        return (self.inds, self.vals, self.halo), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])


# ---------------------------------------------------------------------------
# Halo-plan construction (host side, numpy)
# ---------------------------------------------------------------------------

class _SpacePlan:
    """Halo plan for one entity space (column side)."""

    def __init__(self, n: int, n_parts: int):
        self.n = n
        self.P = n_parts
        self.nL = (n + n_parts - 1) // n_parts
        self.refs_dev = []   # requesting device per reference
        self.refs_col = []   # referenced global index

    def add_refs(self, req_dev, cols):
        req_dev = np.asarray(req_dev, np.int64).ravel()
        cols = np.asarray(cols, np.int64).ravel()
        off = req_dev != cols // self.nL
        self.refs_dev.append(req_dev[off])
        self.refs_col.append(cols[off])

    def finalise(self):
        if self.refs_dev:
            dev = np.concatenate(self.refs_dev)
            col = np.concatenate(self.refs_col)
        else:
            dev = np.zeros(0, np.int64)
            col = np.zeros(0, np.int64)
        Pn, nL = self.P, self.nL
        owner = col // nL
        # per-device sorted halo sets (recv side)
        self.halo_sets = [np.unique(col[dev == p]) for p in range(Pn)]
        # per-owner send sets: union of what any other device requests
        send_sets = [np.unique(col[owner == q]) for q in range(Pn)]
        Hs = max(1, max((len(s) for s in send_sets), default=1))
        Hh = max(1, max((len(h) for h in self.halo_sets), default=1))
        send_idx = np.zeros((Pn, Hs), np.int32)
        send_mask = np.zeros((Pn, Hs), bool)
        for q, ss in enumerate(send_sets):
            send_idx[q, :len(ss)] = ss - q * nL
            send_mask[q, :len(ss)] = True
        recv_map = np.zeros((Pn, Hh), np.int32)
        recv_mask = np.zeros((Pn, Hh), bool)
        for p, hs in enumerate(self.halo_sets):
            if not len(hs):
                continue
            q = hs // nL
            pos = np.array([np.searchsorted(send_sets[int(qq)], g)
                            for qq, g in zip(q, hs)], np.int64)
            recv_map[p, :len(hs)] = (q * Hs + pos).astype(np.int32)
            recv_mask[p, :len(hs)] = True
        self.Hs, self.Hh = Hs, Hh
        self.tables = HaloTables(
            jnp.asarray(send_idx.reshape(-1)),
            jnp.asarray(send_mask.reshape(-1)),
            jnp.asarray(recv_map.reshape(-1)),
            jnp.asarray(recv_mask.reshape(-1)))

    def reindex(self, row_dev, cols, valid):
        """Global col ids -> extended-local ids for rows on row_dev.

        row_dev: [n_rows] device of each row; cols/valid: [n_rows, ...]."""
        cols = np.asarray(cols, np.int64)
        rd = np.asarray(row_dev, np.int64).reshape(
            (-1,) + (1,) * (cols.ndim - 1))
        owner = cols // self.nL
        own = owner == rd
        loc = cols - rd * self.nL
        slot = np.zeros_like(cols)
        for p in range(self.P):
            m = np.broadcast_to(rd == p, cols.shape) & ~own & valid
            if m.any():
                slot[m] = np.searchsorted(self.halo_sets[p], cols[m])
        ext = np.where(own, loc, self.nL + slot)
        return np.where(valid, ext, 0).astype(np.int32)


def _pad_rows(a, n_pad, fill=0):
    """Pad the leading axis of a host/device array to n_pad with fill."""
    a = np.asarray(a)
    if a.shape[0] == n_pad:
        return a
    pad = np.full((n_pad - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


# ---------------------------------------------------------------------------
# The MeshData conversion
# ---------------------------------------------------------------------------

_OP_SPACES = {
    "M_ddx_a_a": ("V", "V"), "M_ddy_a_a": ("V", "V"),
    "M_map_a_b": ("Tri", "V"), "M_ddx_a_b": ("Tri", "V"),
    "M_ddy_a_b": ("Tri", "V"),
    "M_map_b_a": ("V", "Tri"), "M_ddx_b_a": ("V", "Tri"),
    "M_ddy_b_a": ("V", "Tri"),
    "M_ddx_b_b": ("Tri", "Tri"), "M_ddy_b_b": ("Tri", "Tri"),
    "M2_ddx_b_b": ("Tri", "Tri"), "M2_ddy_b_b": ("Tri", "Tri"),
    "M2_d2dx2_b_b": ("Tri", "Tri"), "M2_d2dxdy_b_b": ("Tri", "Tri"),
    "M2_d2dy2_b_b": ("Tri", "Tri"),
}

_M2_NAMES = ["M2_ddx_b_b", "M2_ddy_b_b", "M2_d2dx2_b_b", "M2_d2dxdy_b_b",
             "M2_d2dy2_b_b"]


def _ell_arrays(M, mesh=None, name=None):
    """Padded ELL (inds, vals, mask) for one mesh operator. f64 meshes
    store gather-ELL (device arrays reused directly); f32 meshes store
    TiledEllMatrix slabs, so rebuild the ELL form from the host-side
    scipy CSR in mesh.operators instead."""
    if isinstance(M, EllMatrix):
        inds = np.asarray(M.inds)
        vals = np.asarray(M.vals)
        return inds, vals, vals != 0
    A = _op_csr(mesh, name)
    counts = np.diff(A.indptr)
    K = max(int(counts.max()) if len(counts) else 1, 1)
    inds = np.zeros((A.shape[0], K), np.int32)
    vals = np.zeros((A.shape[0], K), np.float64)
    row_of = np.repeat(np.arange(A.shape[0]), counts)
    pos = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    inds[row_of, pos] = A.indices
    vals[row_of, pos] = A.data
    return inds, vals, vals != 0


def _op_csr(mesh, name):
    A = getattr(mesh.operators, name).tocsr()
    A.sum_duplicates()
    return A


def build_dist_md(mesh, md: MeshData, n_parts: int):
    """Convert a single-device MeshData (+ registered extras) into the
    device-major distributed form. Returns (md_dist, md_specs) where
    md_specs mirrors md_dist with PartitionSpecs for shard_map."""
    Pn = n_parts
    spaces = {"V": _SpacePlan(mesh.nV, Pn),
              "Tri": _SpacePlan(mesh.nTri, Pn),
              "E": _SpacePlan(mesh.nE, Pn)}
    nLv, nLt, nLe = (spaces[s].nL for s in ("V", "Tri", "E"))

    def rows_dev(n, nL):
        return np.arange(n) // nL

    dev_V = rows_dev(mesh.nV, nLv)
    dev_Tri = rows_dev(mesh.nTri, nLt)
    dev_E = rows_dev(mesh.nE, nLe)
    dev_of = {"V": dev_V, "Tri": dev_Tri, "E": dev_E}

    # -- collect references ---------------------------------------------
    op_arrays = {}
    for name, (rs, cs) in _OP_SPACES.items():
        inds, vals, m = _ell_arrays(getattr(md, name), mesh, name)
        op_arrays[name] = (inds, vals, m)
        rd = np.broadcast_to(dev_of[rs][:, None], inds.shape)
        spaces[cs].add_refs(rd[m], inds[m])

    tbls = {
        "C": ("V", "V", np.asarray(md.C), np.asarray(md.mask_C)),
        "VE": ("V", "E", np.asarray(md.VE), np.asarray(md.mask_C)),
        "EV": ("E", "V", np.asarray(md.EV),
               np.ones((mesh.nE, 2), bool)),
        "ETri": ("E", "Tri", np.asarray(md.ETri), np.asarray(md.mask_ETri)),
        "Tri": ("Tri", "V", np.asarray(md.Tri),
                np.ones((mesh.nTri, 3), bool)),
        "TriC": ("Tri", "Tri", np.asarray(md.TriC),
                 np.asarray(md.mask_TriC)),
    }
    for name, (rs, cs, tbl, m) in tbls.items():
        rd = np.broadcast_to(dev_of[rs][:, None], tbl.shape)
        spaces[cs].add_refs(rd[m], tbl[m])

    extra_idx = {}
    for name, e in (md.extras or {}).items():
        if isinstance(e, EIndex):
            arr = np.asarray(e.arr)
            rd = np.broadcast_to(dev_of[e.row].reshape(
                (-1,) + (1,) * (arr.ndim - 1)), arr.shape)
            spaces[e.col].add_refs(rd, arr)
            extra_idx[name] = (arr, np.ones(arr.shape, bool))

    for sp in spaces.values():
        sp.finalise()

    # -- re-index tables ---------------------------------------------------
    def reidx_tbl(name):
        rs, cs, tbl, m = tbls[name]
        ext = spaces[cs].reindex(dev_of[rs], tbl, m)
        return _pad_rows(ext, spaces[rs].nL * Pn, 0)

    C_x = reidx_tbl("C")
    VE_x = reidx_tbl("VE")
    EV_x = reidx_tbl("EV")
    ETri_x = reidx_tbl("ETri")
    Tri_x = reidx_tbl("Tri")
    TriC_x = reidx_tbl("TriC")

    # -- re-index operators -------------------------------------------------
    def dist_op(name):
        rs, cs = _OP_SPACES[name]
        inds, vals, m = op_arrays[name]
        ext = spaces[cs].reindex(dev_of[rs], inds, m)
        n_pad_r = spaces[rs].nL * Pn
        # f32 meshes: store the slab as a split-bf16 (hi, lo) pair so the
        # sharded apply uses the SAME arithmetic as the single-device
        # tiled operators (parity item, VERDICT r3 #8); f64 stays exact.
        return DistEllMatrix(
            jnp.asarray(_pad_rows(ext, n_pad_r, 0)),
            _maybe_split(jnp.asarray(_pad_rows(vals, n_pad_r, 0),
                                     dtype=np.asarray(md.A).dtype)),
            spaces[cs].tables,
            spaces[cs].nL + spaces[cs].Hh)

    ops_dist = {name: dist_op(name) for name in _OP_SPACES}

    # fused M2 stack on the union sparsity (one halo exchange, one gather)
    from ..ops.sparse import csr_from_ell
    m2_csr = [csr_from_ell(getattr(md, n))
              if isinstance(getattr(md, n), EllMatrix)
              else _op_csr(mesh, n) for n in _M2_NAMES]
    U = (sum((A != 0).astype(np.int8) for A in m2_csr)).tocsr()
    U.sum_duplicates()
    U.sort_indices()
    counts = np.diff(U.indptr)
    K_u = max(int(counts.max()), 1)
    u_inds = np.zeros((mesh.nTri, K_u), np.int64)
    u_mask = np.zeros((mesh.nTri, K_u), bool)
    row_of = np.repeat(np.arange(mesh.nTri), counts)
    pos = np.arange(U.nnz) - np.repeat(U.indptr[:-1], counts)
    u_inds[row_of, pos] = U.indices
    u_mask[row_of, pos] = True
    u_vals = np.zeros((mesh.nTri, K_u, len(m2_csr)),
                      np.asarray(md.A).dtype)
    # CSR (row, col) keys are globally sorted, so each operator's entries
    # locate in the union structure with one sorted merge
    KM = U.shape[1]
    key_u = row_of.astype(np.int64) * KM + U.indices
    for oi, A in enumerate(m2_csr):
        A = A.tocsr()
        A.sort_indices()
        c = np.diff(A.indptr)
        r = np.repeat(np.arange(mesh.nTri), c)
        key_a = r.astype(np.int64) * KM + A.indices
        slot = np.searchsorted(key_u, key_a)
        u_vals[r, slot - U.indptr[r], oi] = A.data
    ext_u = spaces["Tri"].reindex(dev_Tri, u_inds, u_mask)
    n_pad_t = nLt * Pn
    m2_stack = DistEllStack(
        jnp.asarray(_pad_rows(ext_u, n_pad_t, 0)),
        _maybe_split(jnp.asarray(_pad_rows(u_vals, n_pad_t, 0))),
        spaces["Tri"].tables, nLt + spaces["Tri"].Hh)

    # -- extras --------------------------------------------------------------
    n_pad = {s: spaces[s].nL * Pn for s in spaces}
    extras_x = {}
    for name, e in (md.extras or {}).items():
        if e.row not in spaces:
            # non-entity-space tables (e.g. the dense block-Jacobi nnz
            # tables, row='BJDnnz') are single-device-only: drop them and
            # let the consumer fall back (ssadiva make_solve checks)
            continue
        if isinstance(e, EIndex):
            arr, m = extra_idx[name]
            ext = spaces[e.col].reindex(dev_of[e.row], arr, m)
            extras_x[name] = EIndex(
                jnp.asarray(_pad_rows(ext, n_pad[e.row], 0)), e.row, e.col)
        else:
            a = np.asarray(e.arr)
            fill = False if a.dtype == bool else 0
            extras_x[name] = EField(
                jnp.asarray(_pad_rows(a, n_pad[e.row], fill)), e.row)

    # -- fields ---------------------------------------------------------------
    f64 = np.asarray(md.A).dtype

    def pf(a, n_padded, fill=0.0):
        return jnp.asarray(_pad_rows(np.asarray(a), n_padded, fill))

    md_dist = MeshData(
        V=pf(md.V, n_pad["V"], 9.9e9),
        TriGC=pf(md.TriGC, n_pad["Tri"], 9.9e9),
        A=pf(md.A, n_pad["V"], 1.0),
        TriA=pf(md.TriA, n_pad["Tri"], 1.0),
        R=pf(md.R, n_pad["V"], float(np.median(np.asarray(md.R)))),
        zeta=md.zeta, zeta_stag=md.zeta_stag,
        C=jnp.asarray(C_x),
        mask_C=pf(md.mask_C, n_pad["V"], False),
        VE=jnp.asarray(VE_x),
        Cw=pf(md.Cw, n_pad["V"], 0.0),
        D_x=pf(md.D_x, n_pad["V"], 0.0),
        D_y=pf(md.D_y, n_pad["V"], 0.0),
        D=pf(md.D, n_pad["V"], 1.0),
        Tri=jnp.asarray(Tri_x),
        EV=jnp.asarray(EV_x),
        ETri=jnp.asarray(ETri_x),
        mask_ETri=pf(md.mask_ETri, n_pad["E"], False),
        VBI=pf(md.VBI, n_pad["V"], 0),
        border_N=pf(md.border_N, n_pad["V"], False),
        border_E=pf(md.border_E, n_pad["V"], False),
        border_S=pf(md.border_S, n_pad["V"], False),
        border_W=pf(md.border_W, n_pad["V"], False),
        M2_stack=m2_stack,
        TriC=jnp.asarray(TriC_x),
        mask_TriC=pf(md.mask_TriC, n_pad["Tri"], False),
        E_len=pf(md.E_len, n_pad["E"], 1e30),
        rev_pos=pf(md.rev_pos, n_pad["V"], 0),
        extras=extras_x,
        halo_V=spaces["V"].tables,
        halo_Tri=spaces["Tri"].tables,
        halo_E=spaces["E"].tables,
        **ops_dist,
    )
    md_dist._host_mesh = mesh
    if hasattr(md, "ssa_has_fix"):
        md_dist.ssa_has_fix = md.ssa_has_fix

    # -- shard_map PartitionSpecs ------------------------------------------
    shard = P(MESH_AXIS)
    md_specs = jax.tree_util.tree_map(lambda _: shard, md_dist)
    md_specs.zeta = P()
    md_specs.zeta_stag = P()

    return md_dist, md_specs, spaces


# ---------------------------------------------------------------------------
# State conversion + the sharded step
# ---------------------------------------------------------------------------

def state_pad(s, nV, nTri, n_pad_V, n_pad_Tri):
    """Pad every per-entity leaf of a state pytree; scalars untouched."""
    def pad(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            if x.shape[0] == nV:
                return jnp.concatenate(
                    [x, jnp.zeros((n_pad_V - nV,) + x.shape[1:], x.dtype)])
            if x.shape[0] == nTri:
                return jnp.concatenate(
                    [x, jnp.zeros((n_pad_Tri - nTri,) + x.shape[1:],
                                  x.dtype)])
        return x
    return jax.tree_util.tree_map(pad, s)


def state_unpad(s, nV, nTri, n_pad_V, n_pad_Tri):
    def unpad(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            if x.shape[0] == n_pad_V:
                return x[:nV]
            if x.shape[0] == n_pad_Tri:
                return x[:nTri]
        return x
    return jax.tree_util.tree_map(unpad, s)


def state_specs(s, n_pad_V, n_pad_Tri):
    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 \
                and x.shape[0] in (n_pad_V, n_pad_Tri):
            return P(MESH_AXIS)
        return P()
    return jax.tree_util.tree_map(spec, s)


class ShardedModel:
    """The full PC ice-dynamics step sharded over a 1-D device mesh."""

    def __init__(self, C, region, n_devices: int, jmesh=None):
        from jax import shard_map
        from ..core.ice.pc import make_pc_step

        self.region = region
        self.nV = region.mesh.nV
        self.nTri = region.mesh.nTri
        self.jmesh = jmesh or make_device_mesh(n_devices)
        Pn = n_devices

        md_dist, md_specs, spaces = build_dist_md(
            region.mesh, region.md, Pn)
        self.md = md_dist
        self._md_specs = md_specs
        self.n_pad_V = spaces["V"].nL * Pn
        self.n_pad_Tri = spaces["Tri"].nL * Pn
        self.spaces = spaces

        pc_raw = make_pc_step(C, md_dist, jit=False)

        def local_step(md, s, dt_max, SMB, BMB, LMB):
            with comm.axis_ctx(MESH_AXIS):
                return pc_raw(md, s, dt_max, SMB=SMB, BMB=BMB, LMB=LMB)

        s_specs = state_specs(
            state_pad(region.state, self.nV, self.nTri,
                      self.n_pad_V, self.n_pad_Tri),
            self.n_pad_V, self.n_pad_Tri)
        v_spec = P(MESH_AXIS)
        self._sharded = jax.jit(shard_map(
            local_step, mesh=self.jmesh,
            in_specs=(md_specs, s_specs, P(), v_spec, v_spec, v_spec),
            out_specs=s_specs, check_vma=False))
        self._zeros_V = jax.device_put(
            jnp.zeros(self.n_pad_V, md_dist.A.dtype),
            NamedSharding(self.jmesh, P(MESH_AXIS)))

    def to_dist(self, state):
        """Pad + place a full-mesh IceState onto the device mesh."""
        sp = state_pad(state, self.nV, self.nTri,
                       self.n_pad_V, self.n_pad_Tri)
        specs = state_specs(sp, self.n_pad_V, self.n_pad_Tri)
        place = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.jmesh, s)),
            sp, specs)
        return place

    def from_dist(self, state_d):
        return state_unpad(jax.device_get(state_d), self.nV, self.nTri,
                           self.n_pad_V, self.n_pad_Tri)

    def pad_field_V(self, x):
        xp = jnp.concatenate(
            [jnp.asarray(x),
             jnp.zeros(self.n_pad_V - self.nV, jnp.asarray(x).dtype)])
        return jax.device_put(xp, NamedSharding(self.jmesh, P(MESH_AXIS)))

    def step(self, state_d, dt_max, SMB=None, BMB=None, LMB=None):
        z = self._zeros_V
        SMB = z if SMB is None else SMB
        BMB = z if BMB is None else BMB
        LMB = z if LMB is None else LMB
        return self._sharded(self.md, state_d, jnp.asarray(dt_max),
                             SMB, BMB, LMB)

    def _build_multistep(self, C):
        """Sharded fast-forward: advance PC steps on the device mesh until
        the prediction window covers t_stop, in ONE dispatch (the sharded
        twin of core.ice.pc.make_pc_multistep, incl. the fused
        thermodynamics catch-up when the region runs the 3-D heat
        equation - its static tables distribute through the extras path).
        The while_loop condition reads the (replicated) scalar t_Hi_next,
        so all devices agree on the step count without extra
        collectives."""
        from jax import shard_map
        from ..core.ice.pc import make_pc_step
        from ..core.ice.pc import interpolate_ice_to_time
        pc_raw = make_pc_step(C, self.md, jit=False)
        thermo_raw = getattr(self.region, "_thermo_step_raw", None) \
            if getattr(self.region, "_thermo_fused", False) else None
        dt_th = C.dt_thermodynamics

        def local_multi(md, s, t_stop, dt_max, SMB, BMB, LMB,
                        T_surf, t_th0, n_max):
            with comm.axis_ctx(MESH_AXIS):
                def cond(c):
                    s_, n, _t = c
                    # n_max hard-bounds the dispatch (tunnel liveness
                    # watchdog; see core.ice.pc.make_pc_multistep)
                    return (s_.t_Hi_next < t_stop - 1e-9) & (n < n_max)

                def body(c):
                    s_, n, t_th = c
                    # overshoot semantics: the ice window extends past
                    # t_stop and the region interpolates Hi inside it
                    # (see core.ice.pc.make_pc_multistep)
                    s_ = pc_raw(md, s_, dt_max, SMB=SMB, BMB=BMB, LMB=LMB)
                    if thermo_raw is not None:
                        def th_cond(c2):
                            _s2, t2 = c2
                            return t2 <= s_.t_Hi_next + 1e-9

                        def th_body(c2):
                            s2, t2 = c2
                            si = interpolate_ice_to_time(s2, t2)
                            Ti_new, _ = thermo_raw(md, si, T_surf, SMB, BMB)
                            return s2.replace(Ti=Ti_new), t2 + dt_th

                        s_, t_th = jax.lax.while_loop(
                            th_cond, th_body, (s_, t_th))
                    return (s_, n + 1, t_th)
                return jax.lax.while_loop(cond, body,
                                          (s, jnp.int32(0), t_th0))

        s_specs = state_specs(
            state_pad(self.region.state, self.nV, self.nTri,
                      self.n_pad_V, self.n_pad_Tri),
            self.n_pad_V, self.n_pad_Tri)
        v_spec = P(MESH_AXIS)
        return jax.jit(shard_map(
            local_multi, mesh=self.jmesh,
            in_specs=(self._md_specs, s_specs, P(), P(),
                      v_spec, v_spec, v_spec, v_spec, P(), P()),
            out_specs=(s_specs, P(), P()), check_vma=False))

    def multistep(self, state_d, t_stop, dt_max, SMB=None, BMB=None,
                  LMB=None, T_surf=None, t_th=0.0, n_max=2 ** 30):
        """Returns (state_d, n_steps, t_thermo_next)."""
        if not hasattr(self, "_multi"):
            self._multi = self._build_multistep(self.region.C)
        z = self._zeros_V
        SMB = z if SMB is None else SMB
        BMB = z if BMB is None else BMB
        LMB = z if LMB is None else LMB
        T_surf = z if T_surf is None else T_surf
        return self._multi(self.md, state_d, jnp.asarray(t_stop),
                           jnp.asarray(dt_max), SMB, BMB, LMB, T_surf,
                           jnp.asarray(float(t_th)), jnp.int32(n_max))

    def halo_stats(self):
        """Per-space halo/occupancy diagnostics for the multichip
        artifact: local block sizes, halo-slot sizes, and the occupancy
        of the padded local blocks (useful vertices / padded size)."""
        out = {}
        for name, sp in self.spaces.items():
            halo_sizes = [int(len(h)) for h in sp.halo_sets]
            out[name] = {
                "n_global": int(sp.n),
                "n_local_padded": int(sp.nL),
                "occupancy": round(sp.n / (sp.nL * sp.P), 4),
                "halo_recv_max": int(sp.Hh),
                "halo_recv_mean": round(float(np.mean(halo_sizes)), 1),
                "halo_frac_of_local": round(sp.Hh / max(sp.nL, 1), 4),
            }
        return out
