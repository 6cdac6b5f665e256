"""Transects: high-resolution output along polylines.

Re-design of src/UFEMISM/transects/transects_main.f90: transects are
specified in the config as 'name,dx=5e3' (hardcoded waypoint sets,
:194-260) or 'file:waypoints.cfg,dx=2e3', resampled to equidistant
vertices, sampled via precomputed barycentric weights, and written to
their own NetCDF files with along-/across-transect velocity components
and grounding-line / calving-front positions (:700-790) - the variables
the reference's integrated-test analyses read (u_ort_3D,
grounding_line_distance_from_start)."""

from __future__ import annotations

import numpy as np

from ..remap.conservative import build_map_trilin_mesh_to_points


def hardcoded_waypoints(mesh, name: str) -> np.ndarray:
    """The reference's native transect waypoint sets
    (transects_main.f90:194-260)."""
    x0, x1 = mesh.xmin, mesh.xmax
    y0, y1 = mesh.ymin, mesh.ymax
    table = {
        "east": [(0, 0), (x1, 0)],
        "west": [(0, 0), (x0, 0)],
        "south": [(0, 0), (0, y0)],
        "north": [(0, 0), (0, y1)],
        "northeast": [(0, 0), (x1, y1)],
        "southeast": [(0, 0), (x1, y0)],
        "northwest": [(0, 0), (x0, y1)],
        "southwest": [(0, 0), (x0, y0)],
        "westeast": [(x0, 0), (x1, 0)],
        "southnorth": [(0, y0), (0, y1)],
        "ISMIP-HOM": [(x0 / 2, y0 / 4), (x1 / 2, y0 / 4)],
    }
    if name not in table:
        raise ValueError(f"unknown native transect option '{name}'")
    return np.asarray(table[name], dtype=np.float64)


def parse_transect_str(s: str):
    """'name,dx=5e3' or 'file:path.cfg,dx=2e3' -> (source, name, filename,
    dx) (parse_transect_str :131-178)."""
    i = s.find(",dx=")
    if i < 0:
        raise ValueError(f"invalid transect string '{s}': no dx")
    name = s[:i]
    dx = float(s[i + 4:])
    if name.startswith("file:"):
        fname = name[5:]
        base = fname.rsplit("/", 1)[-1]
        return "read_from_file", base.rsplit(".", 1)[0], fname, dx
    return "hardcoded", name, "", dx


def resample_waypoints(waypoints: np.ndarray, dx: float) -> np.ndarray:
    """Equidistant vertices along the waypoint polyline
    (calc_transect_vertices_from_waypoints)."""
    seg = np.diff(waypoints, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    s_way = np.concatenate([[0.0], np.cumsum(seg_len)])
    n = max(2, int(np.ceil(s_way[-1] / dx)) + 1)
    s = np.linspace(0.0, s_way[-1], n)
    x = np.interp(s, s_way, waypoints[:, 0])
    y = np.interp(s, s_way, waypoints[:, 1])
    return np.stack([x, y], axis=1)


class Transect:
    def __init__(self, mesh, points: np.ndarray, name: str = "transect"):
        self.name = name
        self.points = np.asarray(points)
        d = np.diff(self.points, axis=0)
        self.s = np.concatenate(
            [[0.0], np.cumsum(np.linalg.norm(d, axis=1))])
        # unit tangent (along-transect) per vertex; normal = tangent
        # rotated -90deg (across-transect, the reference's u_ort)
        t = np.vstack([d, d[-1:]])
        t = t / np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-300)
        self.tangent = t
        self.normal = np.stack([t[:, 1], -t[:, 0]], axis=1)
        self.M_vertices = build_map_trilin_mesh_to_points(mesh, self.points)
        from scipy.spatial import cKDTree
        _, self.tri_idx = cKDTree(mesh.TriGC).query(self.points)
        self.zeta = mesh.zeta

    @classmethod
    def from_config_str(cls, mesh, transect_str: str):
        source, name, fname, dx = parse_transect_str(transect_str)
        if source == "hardcoded":
            wp = hardcoded_waypoints(mesh, name)
        else:
            wp = np.loadtxt(fname, comments=("!", "#", "&", "/"))
            wp = np.atleast_2d(wp)[:, :2]
        return cls(mesh, resample_waypoints(wp, dx), name)

    @classmethod
    def named(cls, mesh, name: str, dx: float = 5e3):
        return cls(mesh, resample_waypoints(
            hardcoded_waypoints(mesh, name), dx), name)

    def sample_vertices(self, field):
        """Sample an a-grid field ([nV] or [nV, k]) along the transect."""
        return self.M_vertices @ np.asarray(field)

    def sample_triangles(self, field):
        """Sample a b-grid field (nearest triangle)."""
        return np.asarray(field)[self.tri_idx]

    def velocity_components(self, u_3D_b, v_3D_b):
        """(u_par_3D, u_ort_3D): along- and across-transect velocity
        [n, nz] (calc_velocity_weights :600-640)."""
        u = self.sample_triangles(u_3D_b)
        v = self.sample_triangles(v_3D_b)
        u_par = u * self.tangent[:, 0:1] + v * self.tangent[:, 1:2]
        u_ort = u * self.normal[:, 0:1] + v * self.normal[:, 1:2]
        return u_par, u_ort

    def zero_crossing_distance(self, f, from_end=False):
        """Distance along the transect to the first sign change of f
        (positive->non-positive), linearly interpolated; NaN if none.
        Used for GL (f = TAF) and CF (f = Hi - tiny) positions."""
        f = np.asarray(f)
        s = self.s
        if from_end:
            f = f[::-1]
            s = s[-1] - s[::-1]
        ix = np.flatnonzero((f[:-1] > 0) & (f[1:] <= 0))
        if len(ix) == 0:
            return float("nan")
        i = ix[0]
        lam = f[i] / (f[i] - f[i + 1])
        return float((1 - lam) * s[i] + lam * s[i + 1])


class TransectOutputFile:
    """transect_<name>.nc with the reference's variable set
    (create_transect_netcdf_output_file :700-790)."""

    def __init__(self, path, transect: Transect):
        from ..io.ncio import NCFile
        self.tr = transect
        self.nc = NCFile(path, "w")
        n = len(transect.points)
        nz = len(transect.zeta)
        self.nc.def_dim("n", n)
        self.nc.def_dim("two", 2)
        self.nc.def_dim("zeta", nz)
        self.nc.def_var("zeta", ("zeta",))
        self.nc.put("zeta", transect.zeta)
        self.nc.def_var("V", ("n", "two"), units="m")
        self.nc.put("V", transect.points)
        self.nc.def_var("s", ("n",), units="m")
        self.nc.put("s", transect.s)
        self.nc.def_dim("time", None)
        self.nc.def_var("time", ("time",), units="years")
        for f in ("Hi", "Hb", "Hs", "Hib", "SL", "TAF"):
            self.nc.def_var(f, ("time", "n"), units="m")
        for f in ("u_par_3D", "u_ort_3D"):
            self.nc.def_var(f, ("time", "n", "zeta"), units="m yr^-1")
        for f in ("grounding_line_distance_from_start",
                  "grounding_line_distance_from_end",
                  "calving_front_distance_from_start",
                  "calving_front_distance_from_end",
                  "ice_mass_flux"):
            self.nc.def_var(f, ("time",))

    def write(self, time, state):
        """Append one timeframe sampled from the (host-fetched) state."""
        import jax
        tr = self.tr
        Hi, Hb, Hs, Hib, SL, TAF, u3, v3 = jax.device_get(
            (state.Hi, state.Hb, state.Hs, state.Hib, state.SL,
             state.TAF, state.u_3D_b, state.v_3D_b))
        first = True
        for name, f in (("Hi", Hi), ("Hb", Hb), ("Hs", Hs),
                        ("Hib", Hib), ("SL", SL), ("TAF", TAF)):
            self.nc.append(name, tr.sample_vertices(f),
                           coord=time if first else None)
            first = False
        u_par, u_ort = tr.velocity_components(u3, v3)
        self.nc.append("u_par_3D", u_par)
        self.nc.append("u_ort_3D", u_ort)
        taf_t = tr.sample_vertices(TAF)
        hi_t = tr.sample_vertices(Hi)
        self.nc.append("grounding_line_distance_from_start",
                       tr.zero_crossing_distance(taf_t))
        self.nc.append("grounding_line_distance_from_end",
                       tr.zero_crossing_distance(taf_t, from_end=True))
        self.nc.append("calving_front_distance_from_start",
                       tr.zero_crossing_distance(hi_t - 0.1))
        self.nc.append("calving_front_distance_from_end",
                       tr.zero_crossing_distance(hi_t - 0.1,
                                                 from_end=True))
        # vertically averaged mass flux across the transect [kg/yr];
        # trapezoidal over zeta so irregular vertical grids are weighted
        # by layer thickness (plain mean is only right for uniform zeta)
        from ..utils.constants import ice_density
        u_vav_ort = np.trapz(u_ort, np.asarray(tr.zeta), axis=1)
        ds = np.gradient(tr.s)
        self.nc.append("ice_mass_flux",
                       float((u_vav_ort * hi_t * ds).sum() * ice_density))
        self.nc.h5.flush()

    def close(self):
        self.nc.close()


# backwards-compatible preset map (round-1 API)
NAMED_TRANSECTS = {
    "MISMIPplus_centreline": lambda mesh: resample_waypoints(
        hardcoded_waypoints(mesh, "westeast"), 2e3),
    "east_west_centre": lambda mesh: resample_waypoints(
        hardcoded_waypoints(mesh, "westeast"), 5e3),
    "south_north_centre": lambda mesh: resample_waypoints(
        hardcoded_waypoints(mesh, "southnorth"), 5e3),
}
