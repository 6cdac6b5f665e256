"""Mesh engine tests (reference analogues: ut_mesh_*, tests_mesh.f90)."""

import numpy as np
import pytest

from ufemism2_tpu.mesh import build_uniform_mesh
from ufemism2_tpu.mesh.triangulation import smallest_angles
from ufemism2_tpu.mesh.zeta import (setup_zeta_grid, integrate_from_base_up,
                                    vertical_average)


def test_mesh_euler_characteristic(small_mesh):
    m = small_mesh
    # planar triangulation of a disk-like region: V - E + F = 1 (excluding
    # outer face)
    assert m.nV - m.nE + m.nTri == 1


def test_voronoi_partition(small_mesh):
    m = small_mesh
    area = (m.xmax - m.xmin) * (m.ymax - m.ymin)
    assert abs(m.A.sum() - area) < 1e-6 * area
    assert (m.A > 0).all()
    assert abs(m.TriA.sum() - area) < 1e-6 * area


def test_mesh_quality(small_mesh):
    m = small_mesh
    assert np.rad2deg(smallest_angles(m.V, m.Tri).min()) > 25.0 - 1e-6
    # circumcentres inside domain
    assert (m.Tricc[:, 0] >= m.xmin).all() and (m.Tricc[:, 0] <= m.xmax).all()
    assert (m.Tricc[:, 1] >= m.ymin).all() and (m.Tricc[:, 1] <= m.ymax).all()


def test_resolution_criterion():
    res = 10e3
    m = build_uniform_mesh(-40e3, 40e3, -40e3, 40e3, res,
                           resolution_tolerance=1.25)
    from ufemism2_tpu.mesh.triangulation import longest_legs
    assert longest_legs(m.V, m.Tri).max() <= res * 1.25 * 1.0001


def test_connectivity_consistency(small_mesh):
    m = small_mesh
    for vi in range(0, m.nV, 7):
        nbrs = m.C[vi][m.C[vi] >= 0]
        # symmetric adjacency
        for vj in nbrs:
            assert vi in m.C[vj][m.C[vj] >= 0]
        # number of triangles around an interior vertex equals its degree
        if m.VBI[vi] == 0:
            assert m.niTri[vi] == m.nC[vi]
        else:
            assert m.niTri[vi] == m.nC[vi] - 1


def test_edges_consistency(small_mesh):
    m = small_mesh
    # border edges have exactly one adjacent triangle
    border_edge = (m.ETri < 0).any(axis=1)
    vbi = m.VBI[m.EV]
    both_border = (vbi > 0).all(axis=1)
    assert (border_edge <= both_border).all()
    # each triangle's 3 edges reference it
    for ti in range(0, m.nTri, 11):
        for e in m.TriE[ti]:
            assert ti in m.ETri[e]


def test_zeta_grids():
    z, zs = setup_zeta_grid("regular", 12)
    assert z[0] == 0 and z[-1] == 1 and len(z) == 12 and len(zs) == 11
    np.testing.assert_allclose(np.diff(z), 1 / 11)

    z, zs = setup_zeta_grid("irregular_log", 12, 10.0)
    assert z[0] == 0 and abs(z[-1] - 1) < 1e-14
    d = np.diff(z)
    ratios = d[1:] / d[:-1]
    np.testing.assert_allclose(ratios, ratios[0])   # constant spacing ratio
    # surface/base spacing ratio ~ R
    np.testing.assert_allclose(d[0] / d[-1], 10.0 ** (10.0 / 11.0), rtol=1e-6)

    z, zs = setup_zeta_grid("old_15_layer_zeta", 15)
    assert len(z) == 15 and z[9] == 0.90


def test_vertical_integration():
    z = np.linspace(1000.0, 0.0, 13)   # physical height, surface->base order
    f = np.ones_like(z)
    out = integrate_from_base_up(z, f)
    np.testing.assert_allclose(out, z)  # integral of 1 from 0 to z = z

    zeta = np.linspace(0, 1, 13)
    vals = 2 * np.ones((5, 13))
    np.testing.assert_allclose(vertical_average(zeta, vals), 2.0)
