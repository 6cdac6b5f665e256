"""Pallas TPU kernel for the bucket-grouped operator-stack SpMV.

The DIVA/BPA hot path applies a 5-operator derivative stack whose flat
tile slab is sized by the WORST row-block's tile count (T=8 on
Morton-ordered meshes) while the mean is ~2.8, so the XLA einsum reads
~2.9x more slab bytes than the nonzero structure needs (PERF_NOTES.md).
`GroupedTiledEllStack` fixes the layout (row blocks bucketed by
T in {2,4,8,16}) but its XLA formulation needed an inverse-row gather
that defeated fusion. This module contracts each bucket inside ONE
Pallas kernel per group:

  grid = (n_blocks_in_group,)
  per block b: DMA the [n_ops, 8, Tg, 128] coefficient block (bf16
  hi/lo split halves, auto-double-buffered by Mosaic), gather the Tg
  x-tiles from a VMEM-resident [2d, n_tiles, 128] split image of x,
  contract on the MXU (three exact bf16 products: hi*xh + hi*xl +
  lo*xh), and write the [n_ops, 8, d] result block.

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


def _group_kernel(tids_ref, xs_ref, hi_ref, lo_ref, y_ref, *, Tg, d):
    """One row-block of one T-bucket: contract [n_ops,8,Tg,128] (split
    into bf16 hi/lo) against the block's gathered x tiles."""
    b = pl.program_id(0)
    f32 = jnp.float32

    # gather the block's Tg x-tiles: xs is [2d, n_tiles, 128]
    # (first d rows = xh planes, last d = xl planes)
    cols = []
    for c in range(2 * d):
        rows = [xs_ref[c, tids_ref[b, t], :] for t in range(Tg)]
        cols.append(jnp.stack(rows))                 # [Tg, 128] bf16
    X = jnp.stack(cols, axis=-1)                     # [Tg, 128, 2d]
    Xh = X[..., :d]

    hi = hi_ref[:, 0]                                # [n_ops, 8, Tg, 128]
    lo = lo_ref[:, 0]
    dn = (((2, 3), (0, 1)), ((), ()))                # contract (Tg, 128)
    y2 = jax.lax.dot_general(hi, X, dn, preferred_element_type=f32)
    y = y2[..., :d] + y2[..., d:]                    # hi*xh + hi*xl
    y = y + jax.lax.dot_general(lo, Xh, dn, preferred_element_type=f32)
    y_ref[:, 0] = y                                  # [n_ops, 8, d]


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
        kern = functools.partial(_group_kernel, Tg=Tg, d=d)
        y = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nBg,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),    # xs, resident
                    pl.BlockSpec((n_ops, 1, R, Tg, 128),
                                 lambda b, s: (0, b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_ops, 1, R, Tg, 128),
                                 lambda b, s: (0, b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((n_ops, 1, R, d),
                                       lambda b, s: (0, b, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((n_ops, nBg, R, d), jnp.float32),
            interpret=bool(interpret),
        )(tid, xs, hi, lo)
        outs.append(y.reshape(n_ops, nBg * R, d))
    yall = jnp.concatenate(outs, axis=1)[:, G.inv_rows]
    return yall[..., 0] if vec else yall
