"""Sub-grid bedrock cumulative density functions (host-side construction).

Re-design of src/UFEMISM/ice_dynamics/utilities/
bedrock_cumulative_density_functions.f90 (calc_bedrock_CDFs_a/_b): for every
vertex (Voronoi cell) and triangle, collect the raw-grid bedrock elevations
of the overlapping grid cells, sort them, and store nbins quantiles. The
reference finds the overlap through the conservative-remap operator; here
the vertex membership uses the exact Voronoi property (nearest vertex) via
a KD-tree, and triangle membership uses point-in-triangle lookup. Built
once per mesh on the host (numpy); the interpolation that runs every ice
step is in subgrid.py (device side).
"""

from __future__ import annotations

import numpy as np


def _quantile_cdfs(owner, vals, n_owners, nbins, fallback):
    """Per-owner sorted quantile sampling (vectorised over owners).

    owner: [N] int owner id per sample; vals: [N]; fallback: [n_owners]
    value used for owners with no samples. Returns [n_owners, nbins].
    Reproduces the reference's bin positions: bin i (0-based) sits at
    fractional sorted index (count-1) * i/(nbins-1).
    """
    order = np.lexsort((vals, owner))
    so = owner[order]
    sv = vals[order]
    ids = np.arange(n_owners)
    starts = np.searchsorted(so, ids, side="left")
    ends = np.searchsorted(so, ids, side="right")
    counts = ends - starts

    i = np.arange(nbins)
    isc = (np.maximum(counts, 1)[:, None] - 1) * i[None, :] / (nbins - 1)
    ii0 = np.floor(isc).astype(np.int64)
    ii1 = np.ceil(isc).astype(np.int64)
    w1 = isc - ii0
    hi = max(len(sv) - 1, 0)
    idx0 = np.clip(starts[:, None] + ii0, 0, hi)
    idx1 = np.clip(starts[:, None] + ii1, 0, hi)
    if len(sv) == 0:
        return np.broadcast_to(fallback[:, None], (n_owners, nbins)).copy()
    cdf = (1.0 - w1) * sv[idx0] + w1 * sv[idx1]
    empty = counts == 0
    if empty.any():
        cdf[empty] = fallback[empty, None]
    return cdf


def calc_bedrock_cdfs(mesh, x_grid, y_grid, Hb_grid, nbins: int):
    """(cdf_a [nV,nbins], cdf_b [nTri,nbins]) from the raw bedrock grid.

    x_grid [nx], y_grid [ny], Hb_grid [nx,ny].
    """
    from scipy.spatial import cKDTree

    X, Y = np.meshgrid(x_grid, y_grid, indexing="ij")
    pts = np.column_stack([X.ravel(), Y.ravel()])
    vals = np.asarray(Hb_grid, dtype=np.float64).ravel()

    # vertices: Voronoi cell membership == nearest vertex
    tree = cKDTree(mesh.V)
    owner_v = tree.query(pts, k=1)[1]

    # fallback for cells with no samples: bedrock interpolated at the vertex
    from scipy.interpolate import RegularGridInterpolator
    interp = RegularGridInterpolator(
        (x_grid, y_grid), np.asarray(Hb_grid, np.float64),
        bounds_error=False, fill_value=None)
    Hb_v = interp(mesh.V)
    cdf_a = _quantile_cdfs(owner_v, vals, mesh.nV, nbins, Hb_v)

    # triangles: containing-triangle lookup
    import matplotlib.tri as mtri
    triang = mtri.Triangulation(mesh.V[:, 0], mesh.V[:, 1], mesh.Tri)
    finder = triang.get_trifinder()
    owner_t = finder(pts[:, 0], pts[:, 1])
    inside = owner_t >= 0
    Hb_t = interp(mesh.Tricc) if hasattr(mesh, "Tricc") and \
        mesh.Tricc is not None else interp(mesh.V[mesh.Tri].mean(axis=1))
    cdf_b = _quantile_cdfs(owner_t[inside], vals[inside], mesh.nTri, nbins,
                           np.asarray(Hb_t))
    return cdf_a, cdf_b


def build_bedrock_cdfs_from_config(C, mesh, region: str):
    """Raw bedrock grid (idealised generator or geometry file) -> CDFs.
    Returns (cdf_a, cdf_b) or None when no raw grid is available
    (initialise_bedrock_CDFs, bedrock_cumulative_density_functions.f90:64).
    """
    nbins = C.subgrid_bedrock_cdf_nbins
    choice = getattr(C, f"choice_refgeo_init_{region}")
    if choice == "idealised":
        from ..idealised_geometries import generate_idealised_geometry_grid
        x, y, Hi, Hb, SL = generate_idealised_geometry_grid(C, region,
                                                            which="init")
        return calc_bedrock_cdfs(mesh, x, y, Hb, nbins)
    if choice == "read_from_file":
        from ...io.input_files import read_geometry_grid_raw
        try:
            x, y, fields = read_geometry_grid_raw(C, region, which="init")
        except Exception:
            return None
        if "Hb" not in fields:
            return None
        return calc_bedrock_cdfs(mesh, x, y, fields["Hb"], nbins)
    return None
