"""Remapping tests (reference analogue: ct_remapping_*, ut_mesh_remapping)."""

import numpy as np
import pytest

from ufemism2_tpu.mesh import build_uniform_mesh
from ufemism2_tpu.mesh.grids import setup_square_grid
from ufemism2_tpu.mesh.operators import build_all_matrix_operators
from ufemism2_tpu.remap import get_map
from ufemism2_tpu.remap.clipping import (clip_convex, polygon_areas_centroids,
                                         pad_polygons)


def test_clip_convex_squares():
    # unit square clipped by shifted square -> quarter overlap
    sq = np.array([[[0, 0], [1, 0], [1, 1], [0, 1]]], dtype=float)
    clip = sq + 0.5
    out, nv = clip_convex(sq, np.array([4]), clip, np.array([4]))
    A, ctr = polygon_areas_centroids(out, nv)
    np.testing.assert_allclose(A[0], 0.25, atol=1e-12)
    np.testing.assert_allclose(ctr[0], [0.75, 0.75], atol=1e-12)


def test_clip_no_overlap():
    sq = np.array([[[0, 0], [1, 0], [1, 1], [0, 1]]], dtype=float)
    clip = sq + 5.0
    out, nv = clip_convex(sq, np.array([4]), clip, np.array([4]))
    A, _ = polygon_areas_centroids(out, nv)
    assert abs(A[0]) < 1e-12


@pytest.fixture(scope="module")
def two_meshes():
    m1 = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 8e3)
    m2 = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 6e3)
    m1.operators = build_all_matrix_operators(m1)
    m2.operators = build_all_matrix_operators(m2)
    return m1, m2


def test_mesh_to_mesh_conservative(two_meshes):
    m1, m2 = two_meshes
    L = 60e3

    def f(x, y):
        return 1000.0 + 300 * np.sin(2 * np.pi * x / L) * np.cos(
            2 * np.pi * y / L)

    f1 = f(m1.V[:, 0], m1.V[:, 1])
    M = get_map(m1, m2)
    f2 = M @ f1
    exact = f(m2.V[:, 0], m2.V[:, 1])
    rmse = np.sqrt(((f2 - exact) ** 2).mean())
    # 2nd-order at these resolutions gives ~5%; convergence order is
    # verified separately by the linear-exactness check below
    assert rmse < 0.07 * exact.std()
    # conservation
    I1 = (f1 * m1.A).sum()
    I2 = (f2 * m2.A).sum()
    assert abs(I1 - I2) / abs(I1) < 1e-3
    # constants map exactly
    ones = M @ np.ones(m1.nV)
    np.testing.assert_allclose(ones, 1.0, atol=1e-10)
    # linear fields map near-exactly in the interior (the 2nd-order
    # gradient correction; residual = centroid-vs-vertex offset)
    g1 = 5.0 + 3e-5 * m1.V[:, 0] - 2e-5 * m1.V[:, 1]
    g2 = M @ g1
    gex = 5.0 + 3e-5 * m2.V[:, 0] - 2e-5 * m2.V[:, 1]
    interior = m2.VBI == 0
    span = gex.max() - gex.min()
    assert np.abs((g2 - gex)[interior]).max() < 0.02 * span


def test_grid_to_mesh(two_meshes):
    m1, _ = two_meshes
    g = setup_square_grid(-50e3, 50e3, -50e3, 50e3, 5e3)

    def f(x, y):
        return x / 1e3 + 2 * y / 1e3

    fg = f(g.centres()[:, 0], g.centres()[:, 1])
    M = get_map(g, m1, method="1st_order_conservative")
    fm = M @ fg
    exact = f(m1.V[:, 0], m1.V[:, 1])
    # linear field, 1st-order map: accurate to ~cell size effects
    assert np.abs(fm - exact).mean() < 2.0


def test_nearest_map(two_meshes):
    m1, m2 = two_meshes
    M = get_map(m1, m2, method="nearest_neighbour")
    f1 = m1.V[:, 0]
    f2 = M @ f1
    assert np.abs(f2 - m2.V[:, 0]).max() < 10e3  # within one cell
