"""Pallas TPU kernel for the bucket-grouped operator-stack SpMV.

The DIVA/BPA hot path applies a 5-operator derivative stack whose flat
tile slab is sized by the WORST row-block's tile count (T=8 on
Morton-ordered meshes) while the mean is ~2.8, so the XLA einsum reads
~2.9x more slab bytes than the nonzero structure needs (PERF_NOTES.md).
`GroupedTiledEllStack` fixes the layout (row blocks bucketed by
T in {2,4,8,16}) but its XLA formulation needed an inverse-row gather
that defeated fusion. This module contracts each bucket inside ONE
Pallas kernel per group:

  grid = (nBg, Tg), Tg minor: step (b, t) DMAs the block's t-th
  coefficient slice [n_ops, 8, 128] (bf16 hi/lo split halves) plus the
  ONE x tile it references - the gather rides the scalar-prefetched
  tile-id table through the BlockSpec index_map, so the DMA engine
  fetches exactly the nonzero structure and nothing else. The product
  is an elementwise VPU FMA reduced over lanes (this op is
  bandwidth-bound; the MXU has nothing to win here), accumulated into
  the block's [n_ops, 8, d] output, which Mosaic keeps VMEM-resident
  across the Tg revisits.

Numerics: hi*(xh+xl) + lo*xh evaluated in f32. xh+xl reconstructs x's
f32 value exactly (bit-pattern split, ops/sparse._split_f32), each
product then rounds at 2^-24 relative - strictly tighter than the
MXU three-product scheme (hi*xh + hi*xl + lo*xh) it replaces, whose
dropped lo*xl term costs 2^-17.

The per-group outputs are reassembled with one [n_ops, n_rows, d]
take() - ~2 MB against the ~500 MB slab read it replaces.

Reference role: this is the PETSc MatMult of the stress-balance solve
(src/UPSY/basic/petsc_basic.f90) on the TPU memory system.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:                           # pragma: no cover
    HAVE_PALLAS = False


def _interpret_default():
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:            # pragma: no cover
        return True


def _group_kernel(tids_ref, xs_ref, hi_ref, lo_ref, y_ref, *, d):
    """Grid step (b, t): accumulate one tile-column of one row block.

    xs_ref: [2d, 1, 128]  - the t-th referenced x tile (gathered by the
                            index_map from the scalar-prefetched tids)
    hi/lo:  [n_ops, 1, R, 1, 128] - the block's t-th coefficient slice
    y_ref:  [n_ops, 1, R, d] - revisited across t (accumulator)
    """
    t = pl.program_id(1)
    f32 = jnp.float32

    xh = xs_ref[:d, 0, :].astype(f32)                 # [d, 128]
    xl = xs_ref[d:, 0, :].astype(f32)
    hi = hi_ref[:, 0, :, 0, :].astype(f32)            # [n_ops, R, 128]
    lo = lo_ref[:, 0, :, 0, :].astype(f32)

    xsum = xh + xl                # exact: reconstructs the f32 operand
    p = (hi[:, :, None, :] * xsum[None, None, :, :]
         + lo[:, :, None, :] * xh[None, None, :, :])  # [n_ops, R, d, 128]
    ps = jnp.sum(p, axis=-1)                          # [n_ops, R, d]

    @pl.when(t == 0)
    def _init():
        y_ref[:, 0] = ps

    @pl.when(t > 0)
    def _acc():
        y_ref[:, 0] = y_ref[:, 0] + ps


@functools.partial(jax.jit, static_argnames=("n_cols", "n_tiles"))
def _split_x_tiles(x, n_cols, n_tiles):
    d = x.shape[1]
    ncp = n_tiles * 128
    xp = jnp.zeros((ncp, d), jnp.float32).at[:n_cols].set(
        x.astype(jnp.float32))
    xt = xp.reshape(n_tiles, 128, d).transpose(2, 0, 1)   # [d, nT, 128]
    from .sparse import _split_f32   # bit-truncation split (see there)
    xh, xl = _split_f32(xt)
    return jnp.concatenate([xh, xl], axis=0)              # [2d, nT, 128]


def grouped_apply_pallas(G, x, interpret=None):
    """x [n_cols(,d)] -> [n_ops, n_rows(,d)] via per-bucket Pallas kernels.

    G is a GroupedTiledEllStack whose per-group coef are bf16 (hi, lo)
    pairs (split SpMV mode)."""
    if interpret is None:
        interpret = _interpret_default()
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
    d = x.shape[1]
    n_tiles = (G.n_cols + 127) // 128
    xs = _split_x_tiles(x, G.n_cols, n_tiles)

    outs = []
    for tid, coef in zip(G.tile_ids, G.coef):
        hi, lo = coef                       # [n_ops, nBg, 8, Tg, 128] bf16
        n_ops, nBg, R, Tg, _ = hi.shape
        kern = functools.partial(_group_kernel, d=d)
        y = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nBg, Tg),
                in_specs=[
                    # the (b, t) gather: tids[b, t] picks the x tile
                    pl.BlockSpec((2 * d, 1, 128),
                                 lambda b, t, s: (0, s[b, t], 0)),
                    pl.BlockSpec((n_ops, 1, R, 1, 128),
                                 lambda b, t, s: (0, b, 0, t, 0)),
                    pl.BlockSpec((n_ops, 1, R, 1, 128),
                                 lambda b, t, s: (0, b, 0, t, 0)),
                ],
                out_specs=pl.BlockSpec((n_ops, 1, R, d),
                                       lambda b, t, s: (0, b, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_ops, nBg, R, d), jnp.float32),
            interpret=bool(interpret),
        )(tid, xs, hi, lo)
        outs.append(y.reshape(n_ops, nBg * R, d))
    yall = jnp.concatenate(outs, axis=1)[:, G.inv_rows]
    return yall[..., 0] if vec else yall
