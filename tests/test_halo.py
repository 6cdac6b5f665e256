"""Phase-2 multichip: explicit halo-exchange shard_map SpMV.

Checks the halo plan + extended-local operator path (parallel/halo.py)
against the single-device gather SpMV, on the 8-virtual-device CPU mesh
(conftest sets XLA_FLAGS=--xla_force_host_platform_device_count=8).
Reference analogue: halo-exchange tests in
automated_testing/unit_tests (mpi halo exchange of mesh fields).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from ufemism2_tpu.ops.sparse import ell_from_csr
from ufemism2_tpu.parallel.sharding import make_device_mesh
from ufemism2_tpu.parallel.halo import make_sharded_spmv


def _random_meshlike_csr(n, rng, k=7, bw=40):
    """Banded random sparsity emulating a Morton-ordered mesh operator."""
    rows = np.repeat(np.arange(n), k)
    cols = rows + rng.integers(-bw, bw + 1, size=rows.size)
    cols = np.clip(cols, 0, n - 1)
    vals = rng.normal(size=rows.size)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    return A


@pytest.mark.parametrize("n", [256, 1000])
def test_sharded_spmv_matches_dense(n):
    rng = np.random.default_rng(0)
    A = _random_meshlike_csr(n, rng)
    M = ell_from_csr(A)
    jmesh = make_device_mesh(8)
    apply_sh, plan = make_sharded_spmv(M, n, 8, jmesh)
    x = jnp.asarray(rng.normal(size=n))
    y_ref = A @ np.asarray(x)
    y = np.asarray(apply_sh(x))
    assert np.allclose(y, y_ref, rtol=1e-12, atol=1e-12)
    # halo never exceeds the full remote space
    assert plan.Hh <= n - plan.nL


def test_sharded_spmv_real_mesh_operator():
    """End-to-end on a real mesh gradient operator."""
    from ufemism2_tpu.mesh.creation import build_uniform_mesh
    from ufemism2_tpu.mesh.operators import build_all_matrix_operators

    m = build_uniform_mesh(-1e6, 1e6, -1e6, 1e6, 200e3, nit_lloyd=1)
    ops = build_all_matrix_operators(m)
    A = ops.M_ddx_a_a.tocsr()
    M = ell_from_csr(A)
    jmesh = make_device_mesh(8)
    apply_sh, plan = make_sharded_spmv(M, m.nV, 8, jmesh)
    x = jnp.asarray(np.sin(m.V[:, 0] / 3e5) * np.cos(m.V[:, 1] / 4e5))
    y_ref = A @ np.asarray(x)
    y = np.asarray(apply_sh(x))
    assert np.allclose(y, y_ref, rtol=1e-10, atol=1e-12)
