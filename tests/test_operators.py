"""Discretisation-operator accuracy tests.

Mirrors the reference's component tests
(ct_discretisation_mapping_derivatives.f90): map/ddx/ddy between grids
applied to smooth analytic functions, RMSE measured on the interior.
"""

import numpy as np

from ufemism2_tpu.ops.sparse import ell_from_csr, csr_from_ell


L = 100e3


def f(x, y):
    return np.sin(2 * np.pi * x / L) * np.cos(2 * np.pi * y / L)


def fx(x, y):
    return 2 * np.pi / L * np.cos(2 * np.pi * x / L) * np.cos(2 * np.pi * y / L)


def fy(x, y):
    return -2 * np.pi / L * np.sin(2 * np.pi * x / L) * np.sin(2 * np.pi * y / L)


def fxx(x, y):
    return -(2 * np.pi / L) ** 2 * f(x, y)


def _rmse(est, exact, mask):
    d = (est - exact)[mask]
    return np.sqrt((d ** 2).mean())


def test_operator_accuracy(small_mesh, small_mesh_ops):
    m, ops = small_mesh, small_mesh_ops
    Va, Vb = m.V, m.TriGC
    fa, fb = f(*Va.T), f(*Vb.T)
    int_a = m.VBI == 0
    int_b = int_a[m.Tri].all(axis=1)
    scale = 2 * np.pi / L

    assert _rmse(ops.M_ddx_a_a @ fa, fx(*Va.T), int_a) / scale < 0.05
    assert _rmse(ops.M_ddy_a_a @ fa, fy(*Va.T), int_a) / scale < 0.05
    assert _rmse(ops.M_map_a_b @ fa, f(*Vb.T), int_b) < 0.02
    assert _rmse(ops.M_ddx_a_b @ fa, fx(*Vb.T), int_b) / scale < 0.08
    assert _rmse(ops.M_map_b_a @ fb, f(*Va.T), int_a) < 0.02
    assert _rmse(ops.M_ddx_b_b @ fb, fx(*Vb.T), int_b) / scale < 0.08
    assert _rmse(ops.M2_d2dx2_b_b @ fb, fxx(*Vb.T), int_b) / scale ** 2 < 0.08
    assert _rmse(ops.M2_ddx_b_b @ fb, fx(*Vb.T), int_b) / scale < 0.08


def test_operator_exactness(small_mesh_ops):
    """Map rows sum to 1; derivative rows sum to 0 (constant annihilation);
    1st-order operators are exact on linear functions."""
    ops = small_mesh_ops
    for name in ["M_map_a_b", "M_map_b_a"]:
        M = getattr(ops, name)
        np.testing.assert_allclose(np.asarray(M.sum(axis=1)).ravel(), 1.0,
                                   atol=1e-12)
    for name in ["M_ddx_a_a", "M_ddy_a_a", "M_ddx_a_b", "M_ddx_b_b",
                 "M2_d2dx2_b_b", "M2_d2dxdy_b_b"]:
        M = getattr(ops, name)
        assert np.abs(np.asarray(M.sum(axis=1)).ravel()).max() < 1e-10


def test_linear_exactness(small_mesh, small_mesh_ops):
    m, ops = small_mesh, small_mesh_ops
    g = 3.0 * m.V[:, 0] + 2.0 * m.V[:, 1] + 7e3
    np.testing.assert_allclose(ops.M_ddx_a_a @ g, 3.0, atol=1e-8)
    np.testing.assert_allclose(ops.M_ddy_a_a @ g, 2.0, atol=1e-8)
    gb = 3.0 * m.TriGC[:, 0] + 2.0 * m.TriGC[:, 1] + 7e3
    np.testing.assert_allclose(ops.M_map_a_b @ g, gb, atol=1e-6)


def test_ell_roundtrip(small_mesh_ops):
    M = small_mesh_ops.M_ddx_a_a
    E = ell_from_csr(M)
    x = np.random.default_rng(0).normal(size=M.shape[1])
    np.testing.assert_allclose(np.asarray(E @ x), M @ x, rtol=1e-10, atol=1e-12)
    M2 = csr_from_ell(E)
    assert abs(M2 - M).max() < 1e-12


def test_ell_spmv_2d(small_mesh_ops):
    M = small_mesh_ops.M_map_a_b
    E = ell_from_csr(M)
    x = np.random.default_rng(1).normal(size=(M.shape[1], 5))
    np.testing.assert_allclose(np.asarray(E @ x), M @ x, rtol=1e-10, atol=1e-12)
