"""Lloyd's relaxation semantics pinned to the reference
(mesh_Lloyds_algorithm.f90:16-73): star-fan centroids for interior
vertices, fixed border vertices, and post-iteration encroaching-triangle
splits that may ADD vertices."""

import numpy as np

from ufemism2_tpu.mesh.refinement import (
    lloyds_algorithm, split_encroaching_triangles, refine_mesh,
    smallest_angles, delaunay_triangulate, UniformCriterion)

XMIN, XMAX, YMIN, YMAX = -100e3, 100e3, -100e3, 100e3


def _base_points():
    return refine_mesh(XMIN, XMAX, YMIN, YMAX, [UniformCriterion(25e3)])


def test_border_vertices_stay_fixed():
    V0 = _base_points()
    V1 = lloyds_algorithm(V0, XMIN, XMAX, YMIN, YMAX, nit=2)
    tol = 1e-6 * (XMAX - XMIN)
    on_border = ((np.abs(V0[:, 0] - XMIN) < tol)
                 | (np.abs(V0[:, 0] - XMAX) < tol)
                 | (np.abs(V0[:, 1] - YMIN) < tol)
                 | (np.abs(V0[:, 1] - YMAX) < tol))
    # without alpha_min no vertices are added, so indices align
    assert len(V1) == len(V0)
    np.testing.assert_allclose(V1[on_border], V0[on_border])
    # interior vertices actually moved
    assert np.abs(V1[~on_border] - V0[~on_border]).max() > 0


def test_interior_vertex_moves_to_star_fan_centroid():
    # a single interior vertex surrounded by an asymmetric ring: the
    # reference's target is the area-weighted centroid of the fan
    # triangles (vi, C(ci), C(ci+1)), NOT the Voronoi-cell centroid
    ring = np.array([[2.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    scale = 50e3
    ring = ring * scale
    border = []
    for t in np.linspace(0, 1, 5):
        for a, b in [((XMIN, YMIN), (XMAX, YMIN)),
                     ((XMAX, YMIN), (XMAX, YMAX)),
                     ((XMAX, YMAX), (XMIN, YMAX)),
                     ((XMIN, YMAX), (XMIN, YMIN))]:
            border.append((a[0] + t * (b[0] - a[0]),
                           a[1] + t * (b[1] - a[1])))
    V = np.concatenate([np.unique(np.array(border), axis=0),
                        ring, [[5e3, 0.0]]])
    vi = len(V) - 1
    V1 = lloyds_algorithm(V.copy(), XMIN, XMAX, YMIN, YMAX, nit=1)
    # hand-compute the star-fan centroid over vi's ACTUAL CCW neighbour
    # ring (reference loop structure, fan triangles (vi, C(ci), C(ci+1)))
    from ufemism2_tpu.mesh.triangulation import Connectivity
    Tri = delaunay_triangulate(V)
    conn = Connectivity(V, Tri, XMIN, XMAX, YMIN, YMAX)
    nbrs = conn.C[vi][:conn.nC[vi]]
    pa = V[vi]
    num = np.zeros(2)
    den = 0.0
    for k in range(len(nbrs)):
        pb = V[nbrs[k]]
        pc = V[nbrs[(k + 1) % len(nbrs)]]
        cr = ((pb[0] - pa[0]) * (pc[1] - pa[1])
              - (pb[1] - pa[1]) * (pc[0] - pa[0]))
        num += cr * (pa + pb + pc) / 3.0
        den += cr
    expect = num / den
    np.testing.assert_allclose(V1[vi], expect, rtol=1e-12, atol=1e-9)
    # and it is NOT the plain neighbour-mean (distinct fixed point)
    assert np.linalg.norm(V1[vi] - V[nbrs].mean(0)) > 1.0


def test_split_encroaching_restores_angle_bound():
    # a deliberately skinny configuration
    rng = np.random.default_rng(0)
    V = np.concatenate([
        np.array([[XMIN, YMIN], [XMAX, YMIN], [XMAX, YMAX], [XMIN, YMAX]]),
        rng.uniform([-90e3, -2e3], [90e3, 2e3], size=(30, 2)),  # thin band
    ])
    alpha = 0.4363
    V2 = split_encroaching_triangles(V, XMIN, XMAX, YMIN, YMAX, alpha)
    Tri = delaunay_triangulate(V2)
    assert len(V2) > len(V)
    assert smallest_angles(V2, Tri).min() >= alpha * 0.999


def test_lloyd_with_alpha_keeps_quality():
    V0 = _base_points()
    V1 = lloyds_algorithm(V0, XMIN, XMAX, YMIN, YMAX, nit=3,
                          alpha_min=0.4363)
    Tri = delaunay_triangulate(V1)
    assert smallest_angles(V1, Tri).min() >= 0.4363 * 0.999
