"""Split-precision SpMV: the bf16 (hi, lo) slab representation and the
Pallas bucket-grouped kernel.

Regression guard for a real XLA hazard found in round 3: computing the
split as `a - f32(bf16(a))` is algebraically folded to zero INSIDE jit
(convert ops treated as value-preserving), silently degrading split mode
to plain bf16. The splitter therefore works on the bit pattern
(ops/sparse.py `_split_f32`); these tests pin the accuracy inside jit.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ufemism2_tpu.ops import sparse as sps
from ufemism2_tpu.ops.sparse import (_split_f32, tiled_from_csr,
                                     tiled_stack_from_csr,
                                     grouped_stack_from_csr)


def _mesh_like_matrix(n=900, k=7, scale=1e10, seed=0):
    """Banded matrix with ~vertex-degree row nnz (mesh-operator-like)."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), k)
    cols = (rows + rng.integers(-40, 41, size=n * k)) % n
    vals = (rng.random(n * k) - 0.5) * scale
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, n))


def test_split_f32_reconstructs_inside_jit():
    a = jnp.asarray((np.random.default_rng(1).random(4096).astype(np.float32)
                     - 0.5) * 1e13)

    @jax.jit
    def recon(a):
        hi, lo = _split_f32(a)
        return hi.astype(jnp.float32) + lo.astype(jnp.float32)

    r = np.asarray(recon(a))
    rel = np.abs(r - np.asarray(a)).max() / np.abs(np.asarray(a)).max()
    assert rel < 2 ** -16, f"split lost precision inside jit: {rel:.2e}"
    # the lo half must be non-trivial (the folding bug zeroed it)
    _, lo = _split_f32(a)
    assert float(jnp.abs(lo.astype(jnp.float32)).max()) > 0.0


def _apply_modes(fn):
    """Run fn under fully-exact split mode (slab AND x split) regardless
    of the env defaults - these tests pin the exact-arithmetic path."""
    old = sps._SPMV_MODE, sps._X_SPLIT
    sps._SPMV_MODE, sps._X_SPLIT = "split", "bits"
    try:
        return fn()
    finally:
        sps._SPMV_MODE, sps._X_SPLIT = old


def test_split_tiled_matvec_accuracy():
    A = _mesh_like_matrix()
    x = np.random.default_rng(2).standard_normal(A.shape[1]).astype(np.float32)
    ref = A @ x.astype(np.float64)

    def run():
        M = tiled_from_csr(A, dtype=jnp.float32)
        assert isinstance(M.coef, tuple), "split mode must store bf16 pairs"
        return np.asarray(jax.jit(lambda v: M @ v)(jnp.asarray(x)))

    y = _apply_modes(run)
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 3e-5, rel


def test_split_stack_and_grouped_match_scipy():
    A = _mesh_like_matrix(seed=3)
    mats = [A, A.T.tocsr(), A.multiply(2.0).tocsr(),
            A.multiply(-0.5).tocsr(), A.multiply(1.7).tocsr()]
    X = np.random.default_rng(4).standard_normal(
        (A.shape[1], 2)).astype(np.float32)

    def run():
        S = tiled_stack_from_csr(mats, dtype=jnp.float32)
        G = grouped_stack_from_csr(mats, dtype=jnp.float32)
        ys = np.asarray(jax.jit(S.apply)(jnp.asarray(X)))
        yg = np.asarray(jax.jit(G.apply)(jnp.asarray(X)))
        return ys, yg

    ys, yg = _apply_modes(run)
    for i, m in enumerate(mats):
        ref = m @ X.astype(np.float64)
        den = np.abs(ref).max()
        assert np.abs(ys[i] - ref).max() / den < 3e-5
        assert np.abs(yg[i] - ref).max() / den < 3e-5


def test_pallas_grouped_kernel_interpret_parity():
    from ufemism2_tpu.ops.pallas_spmv import grouped_apply_pallas

    A = _mesh_like_matrix(n=640, seed=5)
    mats = [A, A.multiply(2.0).tocsr()]
    X = np.random.default_rng(6).standard_normal(
        (A.shape[1], 2)).astype(np.float32)
    x1 = X[:, 0].copy()

    def run():
        G = grouped_stack_from_csr(mats, dtype=jnp.float32)
        yx = np.asarray(G.apply(jnp.asarray(X)))
        yp = np.asarray(grouped_apply_pallas(G, jnp.asarray(X),
                                             interpret=True))
        y1 = np.asarray(grouped_apply_pallas(G, jnp.asarray(x1),
                                             interpret=True))
        return yx, yp, y1

    yx, yp, y1 = _apply_modes(run)
    assert np.allclose(yx, yp, rtol=1e-5, atol=1e-6 * np.abs(yx).max())
    ref = mats[0] @ x1.astype(np.float64)
    assert np.abs(y1[0] - ref).max() / np.abs(ref).max() < 3e-5
