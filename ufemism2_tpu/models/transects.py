"""Transects: high-resolution output along user-defined polylines.

Re-design of src/UFEMISM/transects/: sample u, v, Hi, Hs, T along named or
user-defined polylines via precomputed barycentric interpolation weights
(the reference builds its own mapping matrices).
"""

from __future__ import annotations

import numpy as np

from ..remap.conservative import build_map_trilin_mesh_to_points


NAMED_TRANSECTS = {
    # reference transect presets (transects_main); domain-relative lines
    "MISMIPplus_centreline": lambda mesh: np.stack(
        [np.linspace(mesh.xmin, mesh.xmax, 200),
         np.zeros(200)], axis=1),
    "east_west_centre": lambda mesh: np.stack(
        [np.linspace(mesh.xmin, mesh.xmax, 200),
         np.full(200, 0.5 * (mesh.ymin + mesh.ymax))], axis=1),
    "south_north_centre": lambda mesh: np.stack(
        [np.full(200, 0.5 * (mesh.xmin + mesh.xmax)),
         np.linspace(mesh.ymin, mesh.ymax, 200)], axis=1),
}


class Transect:
    def __init__(self, mesh, points: np.ndarray, name: str = "transect"):
        self.name = name
        self.points = np.asarray(points)
        self.s = np.concatenate(
            [[0.0], np.cumsum(np.linalg.norm(np.diff(self.points, axis=0),
                                             axis=1))])
        self.M_vertices = build_map_trilin_mesh_to_points(mesh, self.points)
        from scipy.spatial import cKDTree
        _, self.tri_idx = cKDTree(mesh.TriGC).query(self.points)

    @classmethod
    def named(cls, mesh, name: str):
        if name not in NAMED_TRANSECTS:
            raise ValueError(f"unknown transect '{name}'")
        return cls(mesh, NAMED_TRANSECTS[name](mesh), name)

    def sample_vertices(self, field):
        """Sample an a-grid field along the transect."""
        return self.M_vertices @ np.asarray(field)

    def sample_triangles(self, field):
        """Sample a b-grid field (nearest triangle)."""
        return np.asarray(field)[self.tri_idx]

    def write(self, nc, time, fields_a: dict, fields_b: dict):
        """Append transect samples to a NetCDF file."""
        if not nc.has("s"):
            nc.def_dim("s", len(self.points))
            nc.def_var("s", ("s",), units="m")
            nc.put("s", self.s)
            nc.def_dim("time", None)
            nc.def_var("time", ("time",), units="years")
            for f in list(fields_a) + list(fields_b):
                nc.def_var(f, ("time", "s"))
        first = True
        for f, v in fields_a.items():
            nc.append(f, self.sample_vertices(v),
                      coord=time if first else None)
            first = False
        for f, v in fields_b.items():
            nc.append(f, self.sample_triangles(v))
