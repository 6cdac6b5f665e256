"""Remapping edge cases.

Reference analogue: the ~10k-LoC trace-line unit-test corpus under
/root/reference/automated_testing/UPSY/unit_tests/ (ut_mesh_remapping_
trace_line_{grid,Vor,tri}.f90) plus interpolation.f90's
remap_cons_2nd_order_1D tests. The TPU build computes overlap integrals
by polygon clipping instead of line tracing, so the equivalent edge
surface is: degenerate overlaps (shared edges, corner touches, slivers),
containment, domain-border clipping, conservation under repeated remap,
and the 1-D vertical remap's boundary/mask behaviour.
"""

import numpy as np
import pytest

from ufemism2_tpu.mesh import build_uniform_mesh
from ufemism2_tpu.mesh.grids import setup_square_grid
from ufemism2_tpu.remap import get_map
from ufemism2_tpu.remap.clipping import (clip_convex, pad_polygons,
                                         polygon_areas_centroids)
from ufemism2_tpu.remap.conservative import remap_vertical_1d


def _clip_one(subject, clipper):
    s, nv_s = pad_polygons([np.asarray(subject, float)])
    c, nv_c = pad_polygons([np.asarray(clipper, float)])
    out, nv = clip_convex(s, nv_s, c, nv_c)
    A, ctr = polygon_areas_centroids(out, nv)
    return A[0], ctr[0], int(nv[0])


SQ = [[0, 0], [1, 0], [1, 1], [0, 1]]


# ---------------------------------------------------------------- clipping

def test_clip_identical_polygons():
    A, ctr, _ = _clip_one(SQ, SQ)
    np.testing.assert_allclose(A, 1.0, atol=1e-12)
    np.testing.assert_allclose(ctr, [0.5, 0.5], atol=1e-12)


def test_clip_shared_edge_is_degenerate():
    # adjacent squares sharing the edge x=1: overlap is a line, area 0
    right = [[1, 0], [2, 0], [2, 1], [1, 1]]
    A, _, _ = _clip_one(SQ, right)
    assert abs(A) < 1e-12


def test_clip_corner_touch_is_degenerate():
    # squares touching at the single point (1,1)
    ne = [[1, 1], [2, 1], [2, 2], [1, 2]]
    A, _, _ = _clip_one(SQ, ne)
    assert abs(A) < 1e-12


def test_clip_containment_both_ways():
    small = [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75]]
    A, ctr, _ = _clip_one(SQ, small)
    np.testing.assert_allclose(A, 0.25, atol=1e-12)
    np.testing.assert_allclose(ctr, [0.5, 0.5], atol=1e-12)
    A2, ctr2, _ = _clip_one(small, SQ)
    np.testing.assert_allclose(A2, 0.25, atol=1e-12)
    np.testing.assert_allclose(ctr2, [0.5, 0.5], atol=1e-12)


def test_clip_sliver_overlap():
    # 1e-9-wide sliver: area must come out positive and exact-ish
    eps = 1e-9
    shifted = [[1 - eps, 0], [2, 0], [2, 1], [1 - eps, 1]]
    A, ctr, _ = _clip_one(SQ, shifted)
    np.testing.assert_allclose(A, eps, rtol=1e-6)
    np.testing.assert_allclose(ctr[0], 1 - eps / 2, atol=1e-9)


def test_clip_triangle_with_square():
    # right triangle (0,0)-(2,0)-(0,2) clipped by the unit square:
    # overlap = unit square minus the corner triangle above x+y=2-..
    # here x+y<=2 cuts nothing inside [0,1]^2, so overlap = triangle part
    tri = [[0, 0], [2, 0], [0, 2]]
    A, _, _ = _clip_one(tri, SQ)
    # region {x,y>=0, x+y<=2} ∩ [0,1]^2 = unit square minus nothing
    # (x+y<=2 holds on [0,1]^2) -> area 1
    np.testing.assert_allclose(A, 1.0, atol=1e-12)
    # and a triangle that actually cuts the square: x+y <= 1
    tri2 = [[0, 0], [1, 0], [0, 1]]
    A2, ctr2, _ = _clip_one(SQ, tri2)
    np.testing.assert_allclose(A2, 0.5, atol=1e-12)
    np.testing.assert_allclose(ctr2, [1 / 3, 1 / 3], atol=1e-12)


def test_clip_octagon_output():
    # square [-1,1]^2 ∩ diamond |x|+|y|<=1.2: an octagon of area
    # 2*1.2^2 - 4 * 0.2^2/ ... = 2.88 - 4*0.02 = 2.80
    sq = [[-1, -1], [1, -1], [1, 1], [-1, 1]]
    d = 1.2
    diamond = [[d, 0], [0, d], [-d, 0], [0, -d]]
    A, ctr, nv = _clip_one(sq, diamond)
    # each protruding corner: area = d'^2 with d'=0.2 legs -> 0.04
    np.testing.assert_allclose(A, 2 * d * d - 4 * (d - 1) ** 2, atol=1e-12)
    np.testing.assert_allclose(ctr, [0, 0], atol=1e-12)
    assert nv == 8


def test_clip_batched_mixed_vertex_counts():
    # batch of (square, triangle) against (triangle, square) in one call
    subs, nv_s = pad_polygons([np.array(SQ, float),
                               np.array([[0, 0], [1, 0], [0, 1]], float)])
    clips, nv_c = pad_polygons([np.array([[0, 0], [1, 0], [0, 1]], float),
                                np.array(SQ, float)])
    out, nv = clip_convex(subs, nv_s, clips, nv_c)
    A, _ = polygon_areas_centroids(out, nv)
    np.testing.assert_allclose(A, [0.5, 0.5], atol=1e-12)


# ------------------------------------------------------- mesh-to-mesh maps

@pytest.fixture(scope="module")
def meshes():
    m1 = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 10e3)
    m2 = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 7.5e3)
    return m1, m2


def test_self_remap_linear_near_exact(meshes):
    # self-remap assigns each cell its linear reconstruction's cell
    # average = f(cell centroid); on interior cells centroid ~ vertex
    m1, _ = meshes
    M = get_map(m1, m1)
    g = 2.0 + 4e-5 * m1.V[:, 0] - 1e-5 * m1.V[:, 1]
    span = g.max() - g.min()
    interior = m1.VBI == 0
    assert np.abs((M @ g - g)[interior]).max() < 5e-3 * span
    np.testing.assert_allclose(M @ np.ones(m1.nV), 1.0, atol=1e-10)


def test_repeated_remap_conserves_mass(meshes):
    m1, m2 = meshes
    M12 = get_map(m1, m2)
    M21 = get_map(m2, m1)
    rng = np.random.default_rng(0)
    f = 1000.0 + 100.0 * rng.standard_normal(m1.nV)
    I0 = (f * m1.A).sum()
    g = f
    for _ in range(3):
        h = M12 @ g
        # the 2nd-order gradient correction makes the map conservative
        # to O(grad*offset), not machine-exact (same as the reference's
        # 2nd-order maps): each pass drifts < ~5e-4 relative, and the
        # drift must stay bounded (not compound) over repeated passes
        np.testing.assert_allclose((h * m2.A).sum(), I0, rtol=2e-3)
        g = M21 @ h
        np.testing.assert_allclose((g * m1.A).sum(), I0, rtol=2e-3)
    # repeated remap is diffusive; the 2nd-order reconstruction may
    # overshoot the data range only marginally
    margin = 0.05 * (f.max() - f.min())
    assert g.min() > f.min() - margin
    assert g.max() < f.max() + margin


def test_partial_coverage_border_clipping(meshes):
    m1, _ = meshes
    # dst mesh covers only the inner quarter of the src domain: the map
    # integrates src Voronoi cells clipped against the dst border
    m_in = build_uniform_mesh(-25e3, 25e3, -25e3, 25e3, 5e3)
    M = get_map(m1, m_in)
    np.testing.assert_allclose(M @ np.ones(m1.nV), 1.0, atol=1e-10)
    f = 1.0 + 3e-5 * m1.V[:, 0] + 2e-5 * m1.V[:, 1]
    fm = M @ f
    exact = 1.0 + 3e-5 * m_in.V[:, 0] + 2e-5 * m_in.V[:, 1]
    span = exact.max() - exact.min()
    interior = m_in.VBI == 0
    assert np.abs((fm - exact)[interior]).max() < 0.03 * span
    # total mass over the sub-domain matches the analytic integral
    # (f linear, domain symmetric about 0 -> mean = 1.0)
    I = (fm * m_in.A).sum()
    np.testing.assert_allclose(I, 1.0 * (50e3 ** 2), rtol=2e-2)


def test_mesh_to_grid_and_back_conserves(meshes):
    m1, _ = meshes
    # grid chosen so its cells tile the mesh domain exactly (centres
    # inset by dx/2): border cells must not overhang the mesh, or the
    # naive sum*dx*dy integral overcounts
    g = setup_square_grid(-43.75e3, 43.75e3, -43.75e3, 43.75e3, 12.5e3)
    Mg = get_map(m1, g)
    Mm = get_map(g, m1)
    f = 500.0 + 1e-4 * m1.V[:, 0] * np.cos(m1.V[:, 1] / 20e3)
    fg = Mg @ f
    I_mesh = (f * m1.A).sum()
    I_grid = fg.sum() * g.dx * g.dy
    np.testing.assert_allclose(I_grid, I_mesh, rtol=1e-4)
    fb = Mm @ fg
    np.testing.assert_allclose((fb * m1.A).sum(), I_mesh, rtol=1e-4)


# ----------------------------------------------------- 1-D vertical remap

def test_vertical_identity_uniform():
    # cell-centre semantics: identity holds on uniform grids (cell
    # midpoint == the point itself); non-uniform grids get the cell
    # average of the reconstruction instead (same as the reference's
    # remap_cons_2nd_order_1D)
    z = np.linspace(0.0, 1.0, 5)
    F = np.array([3.0, 1.0, 4.0, 1.5, 9.0])
    out = remap_vertical_1d(z, z, F)
    np.testing.assert_allclose(out, F, atol=1e-12)


def _cell_midpoints(z):
    zl = np.empty(len(z)); zu = np.empty(len(z))
    zl[1:] = 0.5 * (z[:-1] + z[1:]); zl[0] = z[0] - 0.5 * (z[1] - z[0])
    zu[:-1] = zl[1:];                zu[-1] = z[-1] + 0.5 * (z[-1] - z[-2])
    return 0.5 * (zl + zu)


def test_vertical_linear_exact_nonuniform():
    # a linear profile remaps to its exact cell averages = the linear
    # function at the dst cell midpoints
    z_src = np.array([0.0, 0.05, 0.2, 0.5, 0.9, 1.0])
    z_dst = np.array([0.02, 0.3, 0.55, 0.8, 0.97])
    F = 2.0 - 3.0 * z_src
    out = remap_vertical_1d(z_src, z_dst, F)
    # interior dst cells lie fully inside the src domain and recover the
    # linear profile exactly; the outermost cells overhang the src domain
    # and get clamped cell averages, so only bound them by the data range
    np.testing.assert_allclose(out[1:-1],
                               2.0 - 3.0 * _cell_midpoints(z_dst)[1:-1],
                               atol=1e-12)
    assert F.min() - 1e-12 <= out[0] <= F.max() + 1e-12
    assert F.min() - 1e-12 <= out[-1] <= F.max() + 1e-12


def test_vertical_conservation_refinement():
    # dst = src with each cell split in two (same outer half-spacing
    # extension), layer-thickness-weighted sums agree
    z_src = np.linspace(0.0, 1.0, 6)           # dz = 0.2
    z_dst = np.linspace(-0.05, 1.05, 12)       # dz = 0.1, same outer bounds
    rng = np.random.default_rng(1)
    F = rng.standard_normal(6)
    out = remap_vertical_1d(z_src, z_dst, F)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out.sum() * 0.1, F.sum() * 0.2, rtol=1e-9)


def test_vertical_out_of_range_nearest_fallback():
    z_src = np.array([0.4, 0.5, 0.6])
    z_dst = np.array([0.0, 0.5, 1.0])   # ends far outside src span
    F = np.array([1.0, 2.0, 3.0])
    out = remap_vertical_1d(z_src, z_dst, F)
    assert out[0] == pytest.approx(1.0)    # nearest src cell
    assert out[-1] == pytest.approx(3.0)
    assert out[1] == pytest.approx(2.0, abs=1e-9)


def test_vertical_masks():
    z = np.linspace(0.0, 1.0, 5)
    F = np.arange(5.0)
    out = remap_vertical_1d(z, z, F, mask_src=np.zeros(5, bool))
    np.testing.assert_allclose(out, 0.0)
    out2 = remap_vertical_1d(z, z, F, mask_dst=np.array([1, 1, 0, 1, 1],
                                                        bool))
    assert out2[2] == 0.0
    np.testing.assert_allclose(out2[[0, 1, 3, 4]], F[[0, 1, 3, 4]],
                               atol=1e-12)
    # masked-out src cell: dst cell over it falls back to nearest unmasked
    out3 = remap_vertical_1d(z, z, F, mask_src=np.array([1, 1, 0, 1, 1],
                                                        bool))
    assert np.isfinite(out3).all()
    assert F.min() <= out3[2] <= F.max()


def test_vertical_batched():
    z_src = np.linspace(0.0, 1.0, 8)
    z_dst = np.linspace(0.0, 1.0, 5)
    F = np.arange(24.0).reshape(3, 8)
    out = remap_vertical_1d(z_src, z_dst, F)
    assert out.shape == (3, 5)
    for i in range(3):
        np.testing.assert_allclose(
            out[i], remap_vertical_1d(z_src, z_dst, F[i]), atol=1e-12)
