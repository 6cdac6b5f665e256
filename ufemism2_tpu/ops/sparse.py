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

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


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

    def tree_flatten(self):
        return (self.inds, self.vals), (self.n_cols,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


@partial(jax.jit, donate_argnums=())
def ell_spmv(inds, vals, x):
    """y[i] = sum_k vals[i,k] * x[inds[i,k]]; x may be [n] or [n, d]."""
    g = x[inds]                      # [n_rows, K] or [n_rows, K, d]
    if g.ndim == 3:
        return jnp.einsum("rk,rkd->rd", vals, g)
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
