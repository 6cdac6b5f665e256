"""Explicit halo exchange for sharded mesh fields (phase 2).

TPU-native re-design of the reference's halo-exchange machinery
(src/UPSY/basic/mpi_parallelisation/halo_exchange_mod.f90 +
mesh_halo_exchange.f90): there, each process owns a contiguous vertex
range and exchanges "border" entries with neighbour processes via
MPI_SENDRECV using precomputed halo tables.

Here the same idea maps onto a 1-D jax device mesh:

- vertices are Morton-renumbered (spatial locality) and split into P
  contiguous, equal-sized blocks (padded);
- at build time we compute, per device, the *send set* (the owned entries
  any other device references) and a *recv map* (where each halo entry
  lives inside the concatenated send buffers);
- at run time, inside `shard_map`, each device slices its send buffer
  (one fast row-gather), a single `all_gather` moves only the halo
  entries over ICI (surface-to-volume small), and the receive gather
  builds the extended local vector `[x_own ; x_halo]`;
- sparse operators are re-indexed at build time into this extended local
  column space, so SpMV inside the shard is purely local.

One all_gather of the (padded) union send buffers costs P*Hs values per
device; for a 2-D mesh halo Hs ~ sqrt(nL), so this is far cheaper than
all-gathering the field, and unlike a ppermute ring it is correct for any
partition adjacency (Morton blocks occasionally touch non-adjacent
blocks).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.sparse import EllMatrix
from .sharding import MESH_AXIS


@jax.tree_util.register_pytree_node_class
@dataclass
class HaloPlan:
    """Static halo-exchange tables for a 1-D contiguous partition.

    n_parts P, local block size nL (n_pad = P * nL >= n).
    """

    send_idx: Any   # [P, Hs] int32 local indices each device sends (pad 0)
    send_mask: Any  # [P, Hs] bool
    recv_map: Any   # [P, Hh] int32 index into flattened [P*Hs] gathered buf
    recv_mask: Any  # [P, Hh] bool
    n: int          # true (unpadded) global length
    n_parts: int
    nL: int

    @property
    def Hs(self):
        return self.send_idx.shape[1]

    @property
    def Hh(self):
        return self.recv_map.shape[1]

    def tree_flatten(self):
        return ((self.send_idx, self.send_mask, self.recv_map,
                 self.recv_mask),
                (self.n, self.n_parts, self.nL))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_halo_plan(col_indices_list, n: int, n_parts: int) -> HaloPlan:
    """Build halo tables from the union of operator column references.

    col_indices_list: list of (rows, cols) int arrays of every global
    (row -> col) reference that sharded kernels will make (operator
    structure + neighbour tables). Rows determine the requesting device,
    cols the owner.
    """
    nL = (n + n_parts - 1) // n_parts
    rows = np.concatenate([np.asarray(r, dtype=np.int64).ravel()
                           for r, _ in col_indices_list])
    cols = np.concatenate([np.asarray(c, dtype=np.int64).ravel()
                           for _, c in col_indices_list])
    p_row = rows // nL
    p_col = cols // nL
    off = p_row != p_col                      # off-device references
    # per-owner send sets: unique cols requested by someone else
    send_sets = [np.unique(cols[off & (p_col == q)])
                 for q in range(n_parts)]
    Hs = max(1, max(len(s) for s in send_sets))
    send_idx = np.zeros((n_parts, Hs), dtype=np.int32)
    send_mask = np.zeros((n_parts, Hs), dtype=bool)
    for q, s in enumerate(send_sets):
        send_idx[q, :len(s)] = s - q * nL      # local index on owner
        send_mask[q, :len(s)] = True

    # per-requester halo (recv) sets and their slot in the gathered buffer
    recv_sets = [np.unique(cols[off & (p_row == p)])
                 for p in range(n_parts)]
    Hh = max(1, max(len(s) for s in recv_sets))
    recv_map = np.zeros((n_parts, Hh), dtype=np.int32)
    recv_mask = np.zeros((n_parts, Hh), dtype=bool)
    for p, s in enumerate(recv_sets):
        q = s // nL                            # owner of each halo entry
        loc = s - q * nL
        pos = np.array([np.searchsorted(send_sets[int(qq)], gg)
                        for qq, gg in zip(q, s)], dtype=np.int64) \
            if len(s) else np.zeros(0, dtype=np.int64)
        recv_map[p, :len(s)] = (q * Hs + pos).astype(np.int32)
        recv_mask[p, :len(s)] = True

    return HaloPlan(jnp.asarray(send_idx), jnp.asarray(send_mask),
                    jnp.asarray(recv_map), jnp.asarray(recv_mask),
                    n, n_parts, nL)


def _halo_sets(col_indices_list, n, n_parts):
    """Host-side: per-device sorted halo global index sets (for operator
    re-indexing). Must match build_halo_plan's recv ordering."""
    nL = (n + n_parts - 1) // n_parts
    rows = np.concatenate([np.asarray(r, dtype=np.int64).ravel()
                           for r, _ in col_indices_list])
    cols = np.concatenate([np.asarray(c, dtype=np.int64).ravel()
                           for _, c in col_indices_list])
    off = (rows // nL) != (cols // nL)
    return [np.unique(cols[off & (rows // nL == p)])
            for p in range(n_parts)], nL


def halo_exchange(x_local, send_idx, send_mask, recv_map, recv_mask,
                  axis_name: str = MESH_AXIS):
    """Inside shard_map: extend the local block with halo values.

    x_local: [nL] (or [nL, d]) block owned by this device; the table args
    are THIS device's rows of the HaloPlan (pass them as shard_map inputs
    sharded over their leading device axis). Returns [nL + Hh(, d)].
    """
    send = jnp.where(send_mask[..., None] if x_local.ndim > 1 else send_mask,
                     x_local[send_idx], 0)
    buf = jax.lax.all_gather(send, axis_name)           # [P, Hs(, d)]
    buf = buf.reshape((-1,) + x_local.shape[1:])        # [P*Hs(, d)]
    halo = buf[recv_map]
    halo = jnp.where(recv_mask[..., None] if x_local.ndim > 1 else recv_mask,
                     halo, 0)
    return jnp.concatenate([x_local, halo], axis=0)


def shard_ell(M: EllMatrix, plan: HaloPlan, col_plan: HaloPlan | None = None,
              halo_sets=None) -> EllMatrix:
    """Re-index a global ELL operator into per-device extended-local form.

    Returns an EllMatrix whose arrays carry a leading device axis
    [P, nLr, K]; column indices address [x_own ; x_halo] of length
    nLc + Hh. Row space is padded to P * nLr.
    """
    cp = col_plan or plan
    inds = np.asarray(M.inds)
    vals = np.asarray(M.vals)
    n_rows, K = inds.shape
    Pn = plan.n_parts
    nLr = (n_rows + Pn - 1) // Pn
    nLc = cp.nL
    if halo_sets is None:
        raise ValueError("halo_sets (from _halo_sets) required")

    inds_p = np.zeros((Pn, nLr, K), dtype=np.int32)
    vals_p = np.zeros((Pn, nLr, K), dtype=vals.dtype)
    for p in range(Pn):
        r0, r1 = p * nLr, min((p + 1) * nLr, n_rows)
        ip = inds[r0:r1]
        vp = vals[r0:r1]
        own = (ip // nLc) == p
        loc = np.where(own, ip - p * nLc, 0)
        hs = halo_sets[p]
        hslot = np.searchsorted(hs, ip)
        hslot = np.clip(hslot, 0, max(len(hs) - 1, 0))
        # entries with vals==0 are padding (index 0, owned by dev 0): for
        # p>0 those become bogus halo lookups; zero them explicitly.
        valid = vp != 0
        ext = np.where(own, loc, nLc + hslot)
        inds_p[p, : r1 - r0] = np.where(valid, ext, 0)
        vals_p[p, : r1 - r0] = np.where(valid, vp, 0)
    return EllMatrix(jnp.asarray(inds_p), jnp.asarray(vals_p), nLc + cp.Hh)


def local_spmv(inds, vals, x_ext):
    """SpMV of this device's operator slice [nLr, K] on the extended local
    vector [nLc + Hh(, d)]."""
    g = x_ext[inds]
    if g.ndim == 3:
        return jnp.einsum("rk,rkd->rd", vals, g)
    return (vals * g).sum(axis=1)


def pad_field(x, plan: HaloPlan):
    """Pad a global [n(, d)] field to [P*nL(, d)] for even sharding."""
    n_pad = plan.n_parts * plan.nL
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def make_sharded_spmv(M: EllMatrix, n_cols: int, n_parts: int,
                      jmesh, extra_refs=()):
    """Build a shard_map'ed y = M @ x over a 1-D device mesh.

    Returns (fn, plan) where fn maps a padded sharded x [P*nL] to a padded
    sharded y [P*nLr]. Demonstrates the full phase-2 pipeline; the same
    plan/extended operators generalise to whole model steps.
    """
    from jax import shard_map

    inds = np.asarray(M.inds)
    vals = np.asarray(M.vals)
    rows = np.broadcast_to(np.arange(inds.shape[0])[:, None], inds.shape)
    m = vals != 0
    refs = [(rows[m], inds[m])] + list(extra_refs)
    plan = build_halo_plan(refs, n_cols, n_parts)
    hs, _ = _halo_sets(refs, n_cols, n_parts)
    Mp = shard_ell(M, plan, halo_sets=hs)

    spec = P(MESH_AXIS)

    def _local(x_blk, si, sm, rm, rmk, op_inds, op_vals):
        # each table arg arrives as this device's [1, ...] block
        x_ext = halo_exchange(x_blk.reshape(-1), si[0], sm[0], rm[0], rmk[0])
        return local_spmv(op_inds[0], op_vals[0], x_ext)

    fn = shard_map(_local, mesh=jmesh,
                   in_specs=(spec,) * 7, out_specs=spec,
                   check_vma=False)

    def apply(x):
        xp = pad_field(x, plan)
        y = fn(xp, plan.send_idx, plan.send_mask, plan.recv_map,
               plan.recv_mask, Mp.inds, Mp.vals)
        return y[: M.n_rows]

    return apply, plan
