"""Line output fields (grounding_line / calving_front / ... polylines):
Matlab-contour-format extraction matching the reference's
mesh_contour.f90 + mesh_output_files.f90 write_*_to_file."""

import numpy as np

from ufemism2_tpu.mesh.contour import calc_mesh_contour, line_output_fields


def _segments(CC):
    """Parse NaN-padded Matlab contour format -> list of (n,2) arrays."""
    segs = []
    i = 0
    while i < len(CC) and np.isfinite(CC[i, 0]) and np.isnan(CC[i, 1]):
        n = int(CC[i, 0])
        segs.append(CC[i + 1:i + 1 + n])
        i += n + 1
    return segs


def test_circular_contour_radius(small_mesh):
    """A radial field's zero contour is a circle: every traced point sits
    on it, and the contour closes."""
    m = small_mesh
    r = np.hypot(m.V[:, 0], m.V[:, 1])
    CC = calc_mesh_contour(m, r, level=30e3)
    segs = _segments(CC)
    assert segs, "no contour found"
    pts = np.vstack(segs)
    rr = np.hypot(pts[:, 0], pts[:, 1])
    # crossing points are linear interpolations of r along mesh edges:
    # exact to O(edge_len^2/R) on the circle
    assert np.all(np.abs(rr - 30e3) < 2e3)
    closed = segs[0]
    assert np.allclose(closed[0], closed[-1]), "loop did not close"
    # total contour length ~ 2*pi*R
    L = sum(np.sqrt(((s[1:] - s[:-1]) ** 2).sum(1)).sum() for s in segs)
    assert abs(L - 2 * np.pi * 30e3) / (2 * np.pi * 30e3) < 0.05


def test_linear_contour_hits_border(small_mesh):
    """A planar field's contour crosses the whole domain: open segment
    whose endpoints lie on the domain border."""
    m = small_mesh
    CC = calc_mesh_contour(m, m.V[:, 0], level=1e3)
    segs = _segments(CC)
    assert segs
    pts = np.vstack(segs)
    assert np.all(np.abs(pts[:, 0] - 1e3) < 1.0)
    ends = np.concatenate([segs[0][[0, -1], 1]])
    # both endpoints at ymin/ymax
    assert np.all(np.isclose(np.abs(ends), 50e3, atol=m.nE and 9e3))


def test_nan_masking_truncates(small_mesh):
    """NaN vertices suppress crossings (grounding line restricted to
    ice-covered vertices, write_grounding_line_to_file)."""
    m = small_mesh
    d = np.array(m.V[:, 0], dtype=float)
    d[m.V[:, 1] > 0] = np.nan
    CC = calc_mesh_contour(m, d, level=1e3)
    pts = np.vstack(_segments(CC))
    assert np.all(pts[:, 1] <= 9e3)


def test_line_output_field_masks():
    Hi = np.array([0.0, 500.0, 200.0])
    Hb = np.array([100.0, -600.0, -100.0])
    SL = np.zeros(3)
    TAF = np.array([-1.0, -50.0, 80.0])
    gr = np.array([False, False, True])
    d, lev = line_output_fields("grounding_line", Hi, Hb, SL, TAF, gr)
    assert np.isnan(d[0]) and d[1] == -50.0 and lev == 0.0
    d, lev = line_output_fields("calving_front", Hi, Hb, SL, TAF, gr)
    assert d[1] == 500.0 and np.isnan(d[2]) and lev == 0.05
    d, _ = line_output_fields("coastline", Hi, Hb, SL, TAF, gr)
    assert d[0] == -100.0 and np.isnan(d[1])
    d, _ = line_output_fields("grounded_ice_contour", Hi, Hb, SL, TAF, gr)
    assert d[1] == 0.0 and d[2] == 200.0


def test_mesh_output_file_line_var(tmp_path, small_mesh):
    """MeshOutputFile writes line fields as (time, ei, two)."""
    from ufemism2_tpu.io.output_files import MeshOutputFile
    from ufemism2_tpu.io.ncio import NCFile

    m = small_mesh
    r = np.hypot(m.V[:, 0], m.V[:, 1])
    CC = calc_mesh_contour(m, r, level=30e3)
    p = tmp_path / "out.nc"
    f = MeshOutputFile(p, m, fields=["Hi", "grounding_line"])
    f.write(0.0, {"Hi": np.zeros(m.nV), "grounding_line": CC})
    f.close()
    with NCFile(p) as nc:
        v = np.asarray(nc.read("grounding_line"))
    assert v.shape == (1, m.nE, 2)
    assert np.allclose(v[0], CC, equal_nan=True)
