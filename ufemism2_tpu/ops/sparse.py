"""Device-resident sparse operators in padded ELL form.

TPU-native replacement for the reference's distributed CSR + PETSc SpMV
(src/UPSY/basic/CSR_matrix_algebra/CSR_matrix_vector_multiplication.f90):
unstructured-mesh operators have a small bounded number of entries per row
(~vertex degree), so we store them as dense padded [n_rows, K] index/value
arrays. SpMV is then a gather + weighted row-sum, which XLA fuses into a
single efficient kernel; zero-padding columns point at row 0 with value 0.

This layout is what makes multi-chip sharding trivial: rows are sharded,
`inds` reference global column space, and halo exchange materialises the
needed remote columns (parallel/halo.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

# SpMV contraction mode. The operators' coefficients span ~1e13, so the
# TPU's default bf16-multiply einsum puts ~2e-3 relative noise directly
# on every matvec, inflating Krylov iteration counts; explicit
# HIGHEST-precision (bf16x3) einsums fix the accuracy but crash the
# remote-TPU worker inside the full compiled model ('kernel fault',
# bisected round 3), and a pure-VPU broadcast-multiply-reduce crashes it
# too (the [n_ops, nB, R, T, 128, d] broadcast intermediate). Default is
# therefore 'split': the coefficient slab is stored as a bf16 (hi, lo)
# pair (same bytes as one f32 slab) and contracted with TWO
# default-precision einsums - the one lowering proven stable on the
# remote worker - giving ~8e-6 relative matvecs at unchanged HBM
# traffic (these contractions are bandwidth-bound on the slab).
#   UF_SPMV_MODE=split|einsum|vpu|einsum_highest  (UF_SPMV_HIGHEST=1 is
#   the legacy alias for einsum_highest). UF_HOST_SLAB=1 builds operator
#   slabs host-side and ships them dense (debug fallback; device-side
#   scatter expansion is ~20x faster through the tunnel).
_SPMV_MODE = os.environ.get(
    "UF_SPMV_MODE",
    "einsum_highest" if os.environ.get("UF_SPMV_HIGHEST") else "split")
_HP = jax.lax.Precision.HIGHEST if _SPMV_MODE == "einsum_highest" else None
_HOST_SLAB = bool(os.environ.get("UF_HOST_SLAB"))
# UF_M2_LAYOUT=pallas routes GroupedTiledEllStack.apply through the
# per-bucket Pallas kernel (ops/pallas_spmv.py); requires split mode
_PALLAS_STACK = os.environ.get("UF_M2_LAYOUT") == "pallas"
# x-operand handling inside split-mode _contract. 'none' (default)
# rounds x to bf16 (2e-3 noise on the x side only; the slab side stays
# exact): measured 74 its/solve on the MISMIP 8 km DIVA probe. 'bits'
# adds the exact hi*xl correction term - mathematically strictly more
# accurate, yet measured 377 its/solve on the same probe: the exact
# operator exposes the true stagnation of BJ-GMRES(60) on the membrane
# operator's near-null shelf modes, which the x-rounding noise was
# stochastically regularising. Revisit with the dense block-Jacobi
# preconditioner (PERF_NOTES round 3).
_X_SPLIT = os.environ.get("UF_X_SPLIT", "none")


def _split_f32(a):
    """f32 array -> (hi, lo) bf16 pair: hi + lo == a to ~2^-17 relative.

    The split is done by BIT TRUNCATION (top 16 bits -> hi), not by
    round-and-subtract: XLA's algebraic simplifier folds
    `a - f32(bf16(a))` to zero inside jit (convert ops are treated as
    value-preserving), silently degrading the pair to plain bf16. The
    truncated hi is exactly representable in bf16 and `a - hi` is exact
    in f32 (it is a's low mantissa bits), so only the final bf16
    rounding of lo loses information (~2^-17 of a)."""
    u = jax.lax.bitcast_convert_type(a, jnp.uint32)
    # +0x8000 rounds to nearest bf16 instead of truncating (bit patterns
    # are monotonic in magnitude; fine for all finite non-huge values)
    hi_f32 = jax.lax.bitcast_convert_type(
        (u + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = (a - hi_f32).astype(jnp.bfloat16)
    return hi_f32.astype(jnp.bfloat16), lo


def _maybe_split(coef):
    """Store the slab as a bf16 (hi, lo) pair in split mode (f32 only)."""
    if _SPMV_MODE == "split" and coef.dtype == jnp.float32:
        return _split_f32(coef)
    return coef


def _contract(coef, xg, sub, exact=False):
    """Contract the trailing tile axes of a coefficient slab with gathered
    x-tiles. `coef` is either one array (einsum/vpu modes) or a bf16
    (hi, lo) pair (split mode); `sub` is the einsum subscript.

    `exact=True` forces the x-split (bits) path for THIS apply
    regardless of UF_X_SPLIT: geometry-field applies (surface gradients
    feeding SIA diffusivity / DIVA driving stress) cannot tolerate the
    bf16 x-rounding — +-8 m on a 3000 m Hs column is ~1e-3 ABSOLUTE
    surface-slope noise, which the pc controller reads as truncation
    error and pins dt at dt_ice_min (round-4 diagnosis). They run once
    per step, so the two extra einsums cost nothing; the Krylov matvecs
    keep the measured-faster rounded-x path."""
    if isinstance(coef, tuple):
        # split mode: a ~ hi + lo (bf16 pair, exact to ~2^-17). Each
        # product below is EXACT on the MXU (bf16 x bf16 -> f32 acc).
        hi, lo = coef
        f32 = jnp.float32
        if _X_SPLIT == "none" and not exact:
            # slab exact, x rounded to bf16 (~2e-3 on the x side): the
            # measured sweet spot (see PERF_NOTES noise-regularisation
            # anomaly) - two plain einsums, same slab bytes as one f32
            xh = xg.astype(jnp.bfloat16)
            return (jnp.einsum(sub, hi, xh, preferred_element_type=f32)
                    + jnp.einsum(sub, lo, xh, preferred_element_type=f32))
        # fully exact (~8e-6): x split too; the two hi terms ride one
        # einsum by stacking xh/xl on the trailing vector axis
        xh, xl = _split_f32(xg.astype(f32))
        if sub.split("->")[0].split(",")[1].endswith("d"):   # x was 2-D
            d = xg.shape[-1]
            xs = jnp.concatenate([xh, xl], axis=-1)
            y2 = jnp.einsum(sub, hi, xs, preferred_element_type=f32)
            y = y2[..., :d] + y2[..., d:]
            return y + jnp.einsum(sub, lo, xh, preferred_element_type=f32)
        lhs, out = sub.split("->")
        a_sub, x_sub = lhs.split(",")
        subd = f"{a_sub},{x_sub}d->{out}d"
        xs = jnp.stack([xh, xl], axis=-1)
        y2 = jnp.einsum(subd, hi, xs, preferred_element_type=f32)
        y = y2[..., 0] + y2[..., 1]
        return y + jnp.einsum(sub, lo, xh, preferred_element_type=f32)
    if _SPMV_MODE == "vpu":
        # broadcast xg across the leading slab axes, reduce (t, w) [and d]
        # on the VPU: exact f32 multiply-accumulate, no MXU pass
        nb = coef.ndim - 3          # axes of coef before (r, t, w)
        xb = xg.reshape(xg.shape[:1] + (1,) + xg.shape[1:])   # [b,1,t,w,...]
        xb = xb.reshape((1,) * (nb - 1) + xb.shape)           # lead slab dims
        if xg.ndim == 3:            # x was 1-D: xg [b,t,w]
            return (coef * xb).sum((-2, -1))
        # x was 2-D: xg [b,t,w,d] -> out [..., r, d]
        return (coef[..., None] * xb).sum((-3, -2))
    return jnp.einsum(sub, coef, xg,
                      preferred_element_type=xg.dtype, precision=_HP)


def _slab_head(coef):
    """The representative array of a (possibly split) coefficient slab."""
    return coef[0] if isinstance(coef, tuple) else coef


def exact_mv(M, x):
    """Apply a mesh operator to a GEOMETRY FIELD at full accuracy.

    Krylov matvecs keep the bf16-rounded x-operand (measured sweet spot);
    geometry fields (Hs, Hi, A_flow, ...) go through the split-x path:
    bf16-rounding Hs (+-8 m at 3000 m) puts ~1e-3 ABSOLUTE noise on
    surface slopes, which dominates SIA/DIVA velocities at low-slope
    interiors and pins the pc controller's dt at dt_ice_min."""
    em = getattr(M, "exact_matvec", None)
    return em(x) if em is not None else M @ x


@jax.tree_util.register_pytree_node_class
@dataclass
class EllMatrix:
    """Padded ELL sparse matrix: y = sum_k vals[:, k] * x[inds[:, k]]."""

    inds: jnp.ndarray   # [n_rows, K] int32 column indices (0 where padded)
    vals: jnp.ndarray   # [n_rows, K] values (0 where padded)
    n_cols: int

    @property
    def n_rows(self):
        return self.inds.shape[0]

    @property
    def K(self):
        return self.inds.shape[1]

    def __matmul__(self, x):
        return ell_spmv(self.inds, self.vals, x)

    def exact_matvec(self, x):
        """Full-accuracy apply for geometry fields (see _contract)."""
        return ell_spmv(self.inds, self.vals, x, exact=True)

    def tree_flatten(self):
        return (self.inds, self.vals), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


@partial(jax.jit, donate_argnums=(), static_argnames=("exact",))
def ell_spmv(inds, vals, x, exact=False):
    """y[i] = sum_k vals[i,k] * x[inds[i,k]]; x may be [n] or [n, d]."""
    g = x[inds]                      # [n_rows, K] or [n_rows, K, d]
    if isinstance(vals, tuple):
        # split-bf16 (hi, lo) slab: same arithmetic as split-mode
        # _contract (x rounded to bf16 by default, split-x when exact),
        # so a distributed ELL apply matches the single-device tiled
        # apply product-for-product (reduction order aside).
        sub = "rk,rkd->rd" if g.ndim == 3 else "rk,rk->r"
        return _contract(vals, g, sub, exact=exact)
    if g.ndim == 3:
        # elementwise multiply-reduce, not einsum: exact f32 on the VPU
        # (the K axis is small; TPU's default bf16 einsum would put ~2e-3
        # noise on mass-matrix/preconditioner applies)
        return (vals[:, :, None] * g).sum(axis=1)
    return (vals * g).sum(axis=1)


def ell_from_csr(A: sp.spmatrix, dtype=None, K: int | None = None) -> EllMatrix:
    """Convert a scipy sparse matrix to padded ELL device arrays."""
    A = A.tocsr()
    A.sum_duplicates()
    n_rows, n_cols = A.shape
    counts = np.diff(A.indptr)
    Kmax = int(counts.max()) if len(counts) else 1
    K = K or Kmax
    assert K >= Kmax, "requested ELL width smaller than max row nnz"
    inds = np.zeros((n_rows, K), dtype=np.int32)
    vals = np.zeros((n_rows, K), dtype=np.float64)
    # vectorised scatter of CSR entries into padded rows
    row_of = np.repeat(np.arange(n_rows), counts)
    pos = np.arange(A.nnz) - np.repeat(A.indptr[:-1], counts)
    inds[row_of, pos] = A.indices
    vals[row_of, pos] = A.data
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return EllMatrix(jnp.asarray(inds), jnp.asarray(vals, dtype=dtype), n_cols)


def csr_from_ell(M: EllMatrix) -> sp.csr_matrix:
    """Back-convert (for host-side testing)."""
    inds = np.asarray(M.inds)
    vals = np.asarray(M.vals)
    rows = np.broadcast_to(np.arange(M.n_rows)[:, None], inds.shape)
    m = vals != 0
    return sp.csr_matrix((vals[m], (rows[m], inds[m])),
                         shape=(M.n_rows, M.n_cols))


@jax.tree_util.register_pytree_node_class
@dataclass
class TiledEllMatrix:
    """Tile-blocked sparse matrix for TPU-native SpMV.

    Element gathers are pathologically slow on TPU (serialised scalar
    loads); whole-row gathers of a 2-D array are fast (full 128-lane
    vector loads). So: columns are grouped into 128-wide tiles, rows into
    blocks of R; per row-block we store the T column-tile ids it touches
    plus a dense [R, T*128] coefficient slab. SpMV is then

        xt   = x.reshape(-1, 128)[tile_ids[b]]        # row-gather (fast)
        y[b] = einsum('rtw,tw->r', coef[b], xt)       # dense contraction

    - two dense ops per block, no element gathers.
    """

    tile_ids: jnp.ndarray   # [nB, T] int32 column-tile indices
    coef: jnp.ndarray       # [nB, R, T, 128]
    n_rows: int
    n_cols: int

    @property
    def R(self):
        return _slab_head(self.coef).shape[1]

    @property
    def T(self):
        return _slab_head(self.coef).shape[2]

    def __matmul__(self, x):
        return tiled_spmv(self, x)

    def exact_matvec(self, x):
        """Full-accuracy apply for geometry fields (see _contract)."""
        return tiled_spmv(self, x, exact=True)

    def tree_flatten(self):
        return (self.tile_ids, self.coef), (self.n_rows, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


def _gather_tiles(tile_ids, x, n_cols):
    """x [n_cols(,d)] -> gathered tiles [nB, T, 128(,d)]."""
    ncp = ((n_cols + 127) // 128) * 128
    if x.ndim == 1:
        xp = jnp.zeros(ncp, x.dtype).at[:n_cols].set(x)
        return xp.reshape(-1, 128)[tile_ids]
    d = x.shape[1]
    xp = jnp.zeros((ncp, d), x.dtype).at[:n_cols].set(x)
    return xp.reshape(-1, 128, d)[tile_ids]


def tiled_spmv(M: TiledEllMatrix, x, exact=False):
    """y = M @ x for x [n_cols] or [n_cols, d]."""
    xg = _gather_tiles(M.tile_ids, x, M.n_cols)
    if x.ndim == 1:
        y = _contract(M.coef, xg, "brtw,btw->br", exact=exact)
        return y.reshape(-1)[: M.n_rows]
    y = _contract(M.coef, xg, "brtw,btwd->brd", exact=exact)
    return y.reshape(-1, x.shape[1])[: M.n_rows]


def _tiled_structure(rows, cols, n_rows, R):
    """Shared helper: per-row-block unique column tiles (vectorised)."""
    nB = (n_rows + R - 1) // R
    b_of = rows // R
    tile_of = cols // 128
    nct_max = int(tile_of.max()) + 1 if len(tile_of) else 1
    pairk = b_of.astype(np.int64) * nct_max + tile_of
    uniq = np.unique(pairk)
    ub = (uniq // nct_max).astype(np.int64)
    ut = (uniq % nct_max).astype(np.int64)
    counts = np.bincount(ub, minlength=nB)
    T = max(int(counts.max()), 1)
    first_in_b = np.concatenate([[0], np.cumsum(counts)[:-1]])
    tslot_of_pair = np.arange(len(uniq)) - first_in_b[ub]
    tile_ids = np.zeros((nB, T), dtype=np.int32)
    tile_ids[ub, tslot_of_pair] = ut
    pair_idx = np.searchsorted(uniq, pairk)
    tslot = tslot_of_pair[pair_idx]
    return nB, T, tile_ids, tslot


def _expand_coef_on_device(flat_idx, vals, shape, dtype):
    """Scatter-add COO entries into the dense coefficient slab ON DEVICE.

    The slabs are ~97% structural zeros; shipping only the nnz-sized
    (index, value) arrays and expanding with one device scatter turns a
    multi-hundred-MB host->device transfer (the dominant cost of model
    init and of every remesh event through a remote-device tunnel) into
    a few-MB one. vals may be [nnz] or [n_ops, nnz] (shared pattern).
    """
    n_flat = int(np.prod(shape))
    if _HOST_SLAB:
        v = np.asarray(vals)
        if v.ndim == 1:
            out = np.zeros(n_flat)
            np.add.at(out, np.asarray(flat_idx), v)
            return jnp.asarray(out.reshape(shape), dtype)
        out = np.zeros((v.shape[0], n_flat))
        np.add.at(out, (slice(None), np.asarray(flat_idx)), v)
        return jnp.asarray(out.reshape((v.shape[0],) + tuple(shape)), dtype)
    idx = jnp.asarray(flat_idx, jnp.int32)
    v = jnp.asarray(vals, dtype)
    if v.ndim == 1:
        return jnp.zeros(n_flat, dtype).at[idx].add(v).reshape(shape)
    out = jnp.zeros((v.shape[0], n_flat), dtype).at[:, idx].add(v)
    return out.reshape((v.shape[0],) + tuple(shape))


def tiled_from_csr(A: sp.spmatrix, R: int = 8, dtype=None) -> TiledEllMatrix:
    """Build the tile-blocked form from scipy CSR (host-side structure,
    device-side slab expansion)."""
    A = A.tocsr()
    A.sum_duplicates()
    n_rows, n_cols = A.shape
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    Ac = A.tocoo()
    rows, cols, data = Ac.row.astype(np.int64), Ac.col.astype(np.int64), Ac.data
    nB, T, tile_ids, tslot = _tiled_structure(rows, cols, n_rows, R)
    flat = ((rows // R) * R + rows % R) * (T * 128) + tslot * 128 + cols % 128
    coef = _expand_coef_on_device(flat, data, (nB, R, T, 128), dtype)
    return TiledEllMatrix(jnp.asarray(tile_ids), _maybe_split(coef),
                          n_rows, n_cols)


@jax.tree_util.register_pytree_node_class
@dataclass
class TiledEllStack:
    """A stack of tiled sparse operators sharing one sparsity pattern.

    The five 2nd-order b-grid operators (M2_ddx/ddy/d2dx2/d2dxdy/d2dy2)
    have identical neighbourhoods, so their tile structure is shared and
    all five derivative fields come from ONE tile gather + ONE einsum -
    the DIVA/BPA hot path.
    """

    tile_ids: jnp.ndarray   # [nB, T]
    coef: jnp.ndarray       # [n_ops, nB, R, T, 128]
    n_rows: int
    n_cols: int

    def apply(self, x):
        """x [n_cols(,d)] -> [n_ops, n_rows(,d)]."""
        xg = _gather_tiles(self.tile_ids, x, self.n_cols)
        n_ops = _slab_head(self.coef).shape[0]
        if x.ndim == 1:
            y = _contract(self.coef, xg, "obrtw,btw->obr")
            return y.reshape(n_ops, -1)[:, : self.n_rows]
        y = _contract(self.coef, xg, "obrtw,btwd->obrd")
        return y.reshape(n_ops, -1, x.shape[1])[:, : self.n_rows]

    def tree_flatten(self):
        return (self.tile_ids, self.coef), (self.n_rows, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


def tiled_stack_from_csr(mats, R: int = 8, dtype=None) -> TiledEllStack:
    """Build a shared-structure stack from scipy matrices (same shape)."""
    mats = [m.tocsr() for m in mats]
    n_rows, n_cols = mats[0].shape
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    U = mats[0].copy()
    for m in mats[1:]:
        U = U + m
    Uc = (U != 0).tocoo()
    rows, cols = Uc.row.astype(np.int64), Uc.col.astype(np.int64)
    nB, T, tile_ids, tslot = _tiled_structure(rows, cols, n_rows, R)
    # all ops share the union pattern: one [n_ops, nnz_union] value table
    # expanded by one device scatter (see _expand_coef_on_device)
    flat = (rows * (T * 128) + tslot * 128 + cols % 128)
    key = rows * n_cols + cols
    order = np.argsort(key)
    key_sorted = key[order]
    vals = np.zeros((len(mats), len(rows)))
    for oi, m in enumerate(mats):
        mc = m.tocoo()
        mk = mc.row.astype(np.int64) * n_cols + mc.col.astype(np.int64)
        pos = order[np.searchsorted(key_sorted, mk)]
        np.add.at(vals[oi], pos, mc.data)
    coef = _expand_coef_on_device(flat, vals, (nB, R, T, 128), dtype)
    return TiledEllStack(jnp.asarray(tile_ids), _maybe_split(coef),
                         n_rows, n_cols)


@jax.tree_util.register_pytree_node_class
@dataclass
class GroupedTiledEllStack:
    """TiledEllStack with row blocks bucketed by their tile count.

    The plain stack sizes its coefficient slab by the WORST block's tile
    count (T_max ~ 8 on Morton-ordered meshes) while the mean is ~3, so
    ~2/3 of the HBM traffic is structural zeros. Bucketing blocks into
    T in {2,4,8,16} groups and contracting each group separately reads
    ~T_mean instead of T_max per row (measured 26% faster apply on the
    MISMIP 8 km b-grid; PERF_NOTES.md). Exact same arithmetic.

    Row blocks are permuted group-by-group; `inv_rows` maps the
    concatenated group output back to the original row order.
    """

    tile_ids: tuple     # per group: [nBg, Tg] int32
    coef: tuple         # per group: [n_ops, nBg, R, Tg, 128]
    inv_rows: jnp.ndarray   # [n_rows] int32
    n_rows: int
    n_cols: int

    def apply(self, x):
        """x [n_cols(,d)] -> [n_ops, n_rows(,d)]."""
        if _PALLAS_STACK and isinstance(self.coef[0], tuple):
            from .pallas_spmv import grouped_apply_pallas
            return grouped_apply_pallas(self, x)
        ncp = ((self.n_cols + 127) // 128) * 128
        vec = x.ndim == 1
        if vec:
            x = x[:, None]
        d = x.shape[1]
        xp = jnp.zeros((ncp, d), x.dtype).at[:self.n_cols].set(x)
        xt = xp.reshape(-1, 128, d)
        outs = []
        for tid, coef in zip(self.tile_ids, self.coef):
            xg = xt[tid]                        # [nBg, Tg, 128, d]
            y = _contract(coef, xg, "obrtw,btwd->obrd")
            outs.append(y.reshape(_slab_head(coef).shape[0], -1, d))
        yall = jnp.concatenate(outs, axis=1)[:, self.inv_rows]
        return yall[..., 0] if vec else yall

    def tree_flatten(self):
        return (self.tile_ids, self.coef, self.inv_rows), \
            (self.n_rows, self.n_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0], aux[1])


def grouped_stack_from_csr(mats, R: int = 8, dtype=None,
                           bounds=(2, 4, 8, 16)) -> GroupedTiledEllStack:
    """Build the T-grouped stack from scipy matrices (shared pattern)."""
    mats = [m.tocsr() for m in mats]
    n_rows, n_cols = mats[0].shape
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    U = mats[0].copy()
    for m in mats[1:]:
        U = U + m
    Uc = (U != 0).tocoo()
    rows, cols = Uc.row.astype(np.int64), Uc.col.astype(np.int64)
    nB = (n_rows + R - 1) // R
    b_of = rows // R
    tile_of = cols // 128
    nct = (n_cols + 127) // 128 + 1
    pairs = np.unique(b_of * nct + tile_of)
    pb, pt = pairs // nct, pairs % nct
    T_of_b = np.bincount(pb, minlength=nB)
    first = np.concatenate([[0], np.cumsum(T_of_b)[:-1]])
    slot_of_pair = np.arange(len(pairs)) - first[pb]
    # slot lookup for (block, tile) pairs, vectorised
    pair_key = pb * nct + pt
    while int(T_of_b.max()) > bounds[-1]:
        bounds = tuple(bounds) + (2 * bounds[-1],)   # extend for bad meshes
    group_of_b = np.searchsorted(bounds, np.maximum(T_of_b, 1))
    order = np.argsort(group_of_b, kind="stable")

    tid_groups, coef_groups, ginfo = [], [], []
    for g in range(len(bounds)):
        bs = order[group_of_b[order] == g]
        if len(bs) == 0:
            continue
        Tg = bounds[g]
        tid = np.zeros((len(bs), Tg), np.int32)
        coef = np.zeros((len(mats), len(bs), R, Tg, 128), np.float64)
        bpos = -np.ones(nB, np.int64)
        bpos[bs] = np.arange(len(bs))
        selp = bpos[pb] >= 0
        tid[bpos[pb[selp]], slot_of_pair[selp]] = pt[selp]
        for oi, m in enumerate(mats):
            mc = m.tocoo()
            rr = mc.row.astype(np.int64)
            cc = mc.col.astype(np.int64)
            dd = mc.data
            bb = rr // R
            sel = bpos[bb] >= 0
            rr, cc, dd, bb = rr[sel], cc[sel], dd[sel], bb[sel]
            ss = slot_of_pair[np.searchsorted(pair_key,
                                              bb * nct + cc // 128)]
            np.add.at(coef, (oi, bpos[bb], rr % R, ss, cc % 128), dd)
        ginfo.append(bs)
        tid_groups.append(jnp.asarray(tid))
        coef_groups.append(_maybe_split(jnp.asarray(coef, dtype=dtype)))
    bs_all = np.concatenate(ginfo)
    row_perm = (bs_all[:, None] * R + np.arange(R)[None, :]).reshape(-1)
    inv = np.zeros(nB * R, np.int64)
    inv[row_perm] = np.arange(nB * R)
    return GroupedTiledEllStack(tuple(tid_groups), tuple(coef_groups),
                                jnp.asarray(inv[:n_rows], jnp.int32),
                                n_rows, n_cols)
