"""Voronoi-mirror + border secondary data invariants (mesh_Voronoi.f90,
mesh_edges.f90, mesh_secondary.f90 calc_TriBI)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    from ufemism2_tpu.mesh.refinement import refine_mesh, UniformCriterion
    from ufemism2_tpu.mesh.mesh_types import mesh_from_points
    V = refine_mesh(-1e5, 1e5, -1e5, 1e5, [UniformCriterion(2.5e4)])
    return mesh_from_points(V, -1e5, 1e5, -1e5, 1e5)


def _polygon_area(p):
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def test_translation_tables_roundtrip(mesh):
    from ufemism2_tpu.mesh.voronoi_mesh import construct_voronoi_mesh
    vor = construct_voronoi_mesh(mesh)
    # every triangle is a Voronoi vertex; tables invert each other
    assert (vor["vori2ti"][vor["ti2vori"]] == np.arange(mesh.nTri)).all()
    be = np.flatnonzero(vor["ei2vori"] >= 0)
    assert (vor["vori2ei"][vor["ei2vori"][be]] == be).all()
    cv = np.flatnonzero(vor["vi2vori"] >= 0)
    assert len(cv) == 4                      # the four domain corners
    assert (vor["vori2vi"][vor["vi2vori"][cv]] == cv).all()
    # counts: triangles + border edges + 4 corners
    assert vor["nVor"] == mesh.nTri + len(be) + 4


def test_voronoi_cells_tile_the_domain(mesh):
    """The VVor polygon of each vertex IS its Voronoi cell: the polygon
    area must match mesh.A and the total must be the domain area."""
    from ufemism2_tpu.mesh.voronoi_mesh import construct_voronoi_mesh
    vor = construct_voronoi_mesh(mesh)
    areas = np.empty(mesh.nV)
    for vi in range(mesh.nV):
        idx = vor["VVor"][vi, :vor["nVVor"][vi]]
        assert (idx >= 0).all()
        areas[vi] = _polygon_area(vor["Vor"][idx])
    np.testing.assert_allclose(areas, mesh.A, rtol=1e-6)
    np.testing.assert_allclose(areas.sum(), (2e5) ** 2, rtol=1e-9)


def test_voronoi_connectivity_symmetric(mesh):
    from ufemism2_tpu.mesh.voronoi_mesh import construct_voronoi_mesh
    vor = construct_voronoi_mesh(mesh)
    nC, C = vor["VornC"], vor["VorC"]
    assert set(np.unique(nC)) <= {2, 3}
    for vori in range(vor["nVor"]):
        for vorj in C[vori, :nC[vori]]:
            assert vori in C[vorj, :nC[vorj]], (vori, vorj)


def test_edge_areas_tile_triangles(mesh):
    from ufemism2_tpu.mesh.voronoi_mesh import calc_EA
    EA = calc_EA(mesh)
    assert (EA >= 0).all()
    # the edge sub-triangles tile each mesh triangle exactly when its
    # circumcentre lies inside it (the unsigned-area formula, shared
    # with the reference, over-counts for obtuse triangles) - so the
    # total matches the domain area to the obtuse-triangle fraction
    np.testing.assert_allclose(EA.sum(), mesh.TriA.sum(), rtol=0.10)


def test_border_indices(mesh):
    from ufemism2_tpu.mesh.voronoi_mesh import calc_EBI, calc_TriBI
    EBI = calc_EBI(mesh)
    border = (mesh.ETri < 0).any(axis=1)
    assert ((EBI > 0) == border).all()
    TriBI = calc_TriBI(mesh)
    # triangles inheriting a border code are a subset of those touching
    # the border (sharing at least one border vertex) ...
    touches = (mesh.VBI[mesh.Tri] > 0).any(axis=1)
    assert ((TriBI > 0) <= touches).all()
    # ... and every triangle flanking a border edge has a code
    border_tris = mesh.ETri[border].max(axis=1)
    assert (TriBI[border_tris] > 0).all()


def test_mesh_file_carries_reference_names(tmp_path, mesh):
    from ufemism2_tpu.io.output_files import MeshOutputFile
    import h5py
    p = tmp_path / "m.nc"
    out = MeshOutputFile(str(p), mesh)
    out.close()
    want = {"V", "nC", "C", "niTri", "iTri", "VBI", "Tri", "Tricc",
            "TriC", "TriBI", "TriGC", "TriA", "A", "R", "EV", "ETri",
            "E", "VE", "TriE", "EBI", "EA", "Vor", "VornC", "VorC",
            "nVVor", "VVor", "vi2vori", "ti2vori", "ei2vori",
            "vori2vi", "vori2ti", "vori2ei", "xmin", "xmax", "ymin",
            "ymax", "tol_dist", "zeta"}
    with h5py.File(p, "r") as f:
        have = set(f.keys())
    missing = want - have
    assert not missing, missing
    with h5py.File(p, "r") as f:
        tri = np.asarray(f["Tri"])
        assert tri.min() == 1.0              # 1-based like the reference
        vvor = np.asarray(f["VVor"])
        assert vvor.min() == 0.0             # 0 = none
