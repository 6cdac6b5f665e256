"""Input file reading: fields from NetCDF files onto the model mesh.

Re-design of src/UPSY/io/netcdf_input/ (netcdf_determine_indexing.f90,
netcdf_read_field_from_{xy_grid,lonlat_grid,mesh,series}_file.f90,
netcdf_setup_grid_mesh_from_file.f90) and
src/UPSY/io/read_and_remap/read_and_remap_field_from_file.f90: a file can
hold data on a regular x/y grid, a regular lon/lat grid, or a mesh; the
layout is auto-detected, indexing/orientation normalised, the requested
timeframe selected, and the field remapped onto the model mesh
(2nd-order conservative for x/y grids and meshes, bilinear for lon/lat
grids), with 3-D fields additionally remapped in the vertical (zeta or
ocean depth).
"""

from __future__ import annotations

import numpy as np

from .ncio import NCFile, find_field, resolve_field_name
from ..utils.logging_utils import warning


# ---------------------------------------------------------------------------
# Legacy geometry API (kept: bedrock CDF / refgeo initialisation paths)
# ---------------------------------------------------------------------------

def read_geometry_onto_mesh(C, region_name, mesh, which="init"):
    """Read (Hi, Hb, SL) from the configured init-geometry file and
    interpolate onto mesh vertices (bilinear)."""
    fname = getattr(C, f"filename_refgeo_{which}_{region_name}")
    with NCFile(fname) as nc:
        x = find_field(nc, "x")
        y = find_field(nc, "y")
        Hi = find_field(nc, "Hi")
        Hb = find_field(nc, "Hb")
        SL = np.zeros_like(Hi) if not nc.has("SL") else nc.read("SL")
    # field orientation: [y, x] or [x, y]; detect from shape
    if Hi.shape == (len(y), len(x)):
        Hi, Hb, SL = Hi.T, Hb.T, SL.T
    Hi_m = bilinear_sample(x, y, Hi, mesh.V)
    Hb_m = bilinear_sample(x, y, Hb, mesh.V)
    SL_m = bilinear_sample(x, y, SL, mesh.V)
    Hi_m = np.where(Hi_m < C.refgeo_Hi_min, 0.0, Hi_m)
    return Hi_m, Hb_m, SL_m


def bilinear_sample(x, y, F, points):
    """Bilinear interpolation of F[x,y] at points [n,2]."""
    xi = np.clip(np.searchsorted(x, points[:, 0]) - 1, 0, len(x) - 2)
    yi = np.clip(np.searchsorted(y, points[:, 1]) - 1, 0, len(y) - 2)
    wx = np.clip((points[:, 0] - x[xi]) / (x[xi + 1] - x[xi]), 0, 1)
    wy = np.clip((points[:, 1] - y[yi]) / (y[yi + 1] - y[yi]), 0, 1)
    return (F[..., xi, yi] * (1 - wx) * (1 - wy)
            + F[..., xi + 1, yi] * wx * (1 - wy)
            + F[..., xi, yi + 1] * (1 - wx) * wy
            + F[..., xi + 1, yi + 1] * wx * wy)


def read_geometry_grid_raw(C, region_name, which="init"):
    """Raw gridded geometry (x, y, {Hi, Hb, SL}) without remapping
    (netcdf_input raw readers; used e.g. by the bedrock-CDF builder)."""
    fname = getattr(C, f"filename_refgeo_{which}_{region_name}")
    with NCFile(fname) as nc:
        x = find_field(nc, "x")
        y = find_field(nc, "y")
        fields = {}
        for name in ("Hi", "Hb", "SL"):
            try:
                F = find_field(nc, name)
            except Exception:
                continue
            if F.shape == (len(y), len(x)):
                F = F.T
            fields[name] = F
    return x, y, fields


# ---------------------------------------------------------------------------
# Layout detection + grid/mesh setup from file
# ---------------------------------------------------------------------------

def inquire_file_layout(nc: NCFile) -> str:
    """'xy' | 'lonlat' | 'mesh' (netcdf_determine_indexing.f90 logic:
    which coordinate variables exist)."""
    if nc.has("V") and nc.has("Tri"):
        return "mesh"
    if resolve_field_name(nc, "x") and resolve_field_name(nc, "y"):
        return "xy"
    if resolve_field_name(nc, "lon") and resolve_field_name(nc, "lat"):
        return "lonlat"
    raise ValueError(f"cannot determine grid type of {nc.path}: "
                     "no x/y, lon/lat, or mesh variables found")


def setup_xy_grid_from_file(nc: NCFile):
    """Grid object from the file's x/y axes (ascending-normalised)."""
    from ..mesh.grids import Grid
    x = np.asarray(find_field(nc, "x"), dtype=np.float64)
    y = np.asarray(find_field(nc, "y"), dtype=np.float64)
    flip_x = len(x) > 1 and x[1] < x[0]
    flip_y = len(y) > 1 and y[1] < y[0]
    if flip_x:
        x = x[::-1].copy()
    if flip_y:
        y = y[::-1].copy()
    dx = float(x[1] - x[0]) if len(x) > 1 else 1.0
    dy = float(y[1] - y[0]) if len(y) > 1 else dx
    return Grid(x=x, y=y, dx=dx, dy=dy), flip_x, flip_y


def setup_lonlat_grid_from_file(nc: NCFile):
    from ..mesh.grids import GridLonLat
    lon = np.asarray(find_field(nc, "lon"), dtype=np.float64) % 360.0
    lat = np.asarray(find_field(nc, "lat"), dtype=np.float64)
    flip_lat = len(lat) > 1 and lat[1] < lat[0]
    if flip_lat:
        lat = lat[::-1].copy()
    # re-sort longitudes ascending after the %360 wrap
    order = np.argsort(lon, kind="stable")
    return GridLonLat(lon=lon[order], lat=lat), order, flip_lat


def setup_mesh_from_file(path_or_nc):
    """Reconstruct a Mesh from a mesh NetCDF file (ours or the
    reference's; netcdf_setup_grid_mesh_from_file.f90). Connectivity and
    secondary data are rebuilt from V/Tri."""
    from ..mesh.mesh_types import mesh_from_points
    own = not isinstance(path_or_nc, NCFile)
    nc = NCFile(path_or_nc) if own else path_or_nc
    try:
        V = np.asarray(nc.read("V"), dtype=np.float64)
        Tri = np.asarray(nc.read("Tri"))
        if V.shape[0] == 2 and V.shape[1] != 2:
            V = V.T
        if Tri.shape[0] == 3 and Tri.shape[1] != 3:
            Tri = Tri.T
        if Tri.min() >= 1:      # reference files are 1-based
            Tri = Tri - 1
        kw = {}
        if nc.has("zeta"):
            z = nc.read("zeta")
            kw["nz"] = len(z)
        xmin, xmax = float(V[:, 0].min()), float(V[:, 0].max())
        ymin, ymax = float(V[:, 1].min()), float(V[:, 1].max())
        return mesh_from_points(V, xmin, xmax, ymin, ymax,
                                Tri=np.asarray(Tri, dtype=np.int64), **kw)
    finally:
        if own:
            nc.close()


def find_timeframe(nc: NCFile, time_to_read: float) -> int:
    """Index of the timeframe closest to time_to_read
    (netcdf_basic find_timeframe)."""
    t = np.asarray(find_field(nc, "time"), dtype=np.float64)
    ti = int(np.argmin(np.abs(t - time_to_read)))
    if abs(t[ti] - time_to_read) > 1e-9 * max(1.0, abs(time_to_read)) \
            and (time_to_read < t.min() - 1e-9 or
                 time_to_read > t.max() + 1e-9):
        warning(f"requested time {time_to_read} outside file range "
                f"[{t.min()}, {t.max()}] of {nc.path}; using nearest frame")
    return ti


# ---------------------------------------------------------------------------
# Raw field reading with indexing normalisation
# ---------------------------------------------------------------------------

def _read_raw(nc: NCFile, field_name: str, layout: str, ndims: str,
              time_to_read):
    """Read + orientation-normalise a field.

    Returns (data, extra_axis) where data has shape [n_extra?, dim1, dim2]
    for grids ([x, y] / [lon, lat] order, ascending axes) or
    [n_extra?, nV] for meshes; extra_axis is the zeta/depth/month vector
    (None for 2D).
    """
    name = resolve_field_name(nc, field_name)
    if name is None:
        raise KeyError(f"no variable matching '{field_name}' in {nc.path}")
    data = nc.read(name)
    dims = nc.dim_names(name)
    nd = len(dims)

    # classify each axis by dimension name; fall back to size matching
    axis_kind = [""] * nd
    sizes = {}
    for canon in ("x", "y", "lon", "lat", "zeta", "depth", "month", "time"):
        n = resolve_field_name(nc, canon)
        if n is not None:
            sizes[canon] = len(nc.read(n))
    from .ncio import FIELD_ALIASES
    for i, d in enumerate(dims):
        for canon in ("time", "x", "y", "lon", "lat", "zeta", "depth",
                      "month"):
            if d in FIELD_ALIASES.get(canon, [canon]):
                axis_kind[i] = canon
                break
        if not axis_kind[i] and d == "vi":
            axis_kind[i] = "mesh"
    for i in range(nd):
        if not axis_kind[i]:
            # size-based fallback (files with unnamed dims)
            cands = [k for k, v in sizes.items()
                     if v == data.shape[i] and k not in axis_kind]
            axis_kind[i] = cands[0] if cands else ""

    # select the timeframe
    if "time" in axis_kind:
        ti = 0 if time_to_read is None else find_timeframe(nc, time_to_read)
        ax = axis_kind.index("time")
        data = np.take(data, ti, axis=ax)
        axis_kind.pop(ax)
    elif time_to_read is not None:
        warning(f"'{field_name}' in {nc.path} has no time dimension; "
                "ignoring time_to_read")

    # extra (vertical / monthly) axis
    extra = None
    extra_kind = {"3D": "zeta", "3D_ocean": "depth",
                  "2D_monthly": "month"}.get(ndims)
    if extra_kind is not None:
        if extra_kind in axis_kind:
            ax = axis_kind.index(extra_kind)
            data = np.moveaxis(data, ax, 0)
            axis_kind.insert(0, axis_kind.pop(ax))
            n = resolve_field_name(nc, extra_kind)
            extra = (np.asarray(nc.read(n), dtype=np.float64)
                     if n is not None else np.arange(data.shape[0]) + 1.0)
        else:
            raise ValueError(f"'{field_name}' in {nc.path}: expected a "
                             f"{extra_kind} dimension for ndims={ndims}")

    # spatial normalisation
    off = 1 if extra is not None else 0
    if layout == "mesh":
        return data, extra
    d1, d2 = ("x", "y") if layout == "xy" else ("lon", "lat")
    sk = axis_kind[off:]
    if sk == [d2, d1]:
        data = np.swapaxes(data, off, off + 1)
    elif sk != [d1, d2]:
        # ambiguous (e.g. square grid with unnamed dims): assume [d1, d2]
        if data.shape[off] != sizes.get(d1):
            data = np.swapaxes(data, off, off + 1)
    return data, extra


# ---------------------------------------------------------------------------
# The generic read-and-remap API
# ---------------------------------------------------------------------------

def _remap_to_mesh(nc, layout, data, mesh, method):
    """Remap spatially-normalised data ([..., d1, d2] or [..., nV_src])
    onto model mesh vertices -> [..., nV]."""
    from ..remap.atlas import get_map

    if layout == "xy":
        grid, flip_x, flip_y = setup_xy_grid_from_file(nc)
        if flip_x:
            data = data[..., ::-1, :]
        if flip_y:
            data = data[..., :, ::-1]
        if method in (None, "2nd_order_conservative"):
            M = get_map(grid, mesh, "2nd_order_conservative")
            flat = data.reshape(-1, grid.n)    # [extra, nx*ny] row-major x,y
            out = (M @ flat.T).T
            return out.reshape(data.shape[:-2] + (mesh.nV,))
        # bilinear sampling fallback
        return bilinear_sample(grid.x, grid.y, data, mesh.V)

    if layout == "lonlat":
        grid, order, flip_lat = setup_lonlat_grid_from_file(nc)
        if flip_lat:
            data = data[..., :, ::-1]
        data = data[..., order, :]
        if mesh.lon is None:
            raise ValueError("mesh has no lon/lat secondary data; set the "
                             "region projection (set_mesh_lonlat) before "
                             "reading lon/lat input")
        idx, w = grid.bilinear_weights(mesh.lon, mesh.lat)
        flat = data.reshape(-1, grid.n)
        return (flat[:, idx] * w).sum(axis=-1).reshape(
            data.shape[:-2] + (mesh.nV,))

    # mesh layout
    src_mesh = setup_mesh_from_file(nc)
    m = method or "2nd_order_conservative"
    M = get_map(src_mesh, mesh, m)
    flat = data.reshape(-1, src_mesh.nV)
    return (M @ flat.T).T.reshape(data.shape[:-1] + (mesh.nV,))


def read_field_from_file_2D(filename, field_name, mesh, time_to_read=None,
                            method=None):
    """Read a 2-D field from any supported file and map onto mesh vertices
    (read_and_remap_field_from_file.f90 read_field_from_file_2D)."""
    with NCFile(filename) as nc:
        layout = inquire_file_layout(nc)
        data, _ = _read_raw(nc, field_name, layout, "2D", time_to_read)
        return _remap_to_mesh(nc, layout, data, mesh, method)


def read_field_from_file_2D_monthly(filename, field_name, mesh,
                                    time_to_read=None, method=None):
    """[nV, 12] monthly field (read_field_from_file_2D_monthly)."""
    with NCFile(filename) as nc:
        layout = inquire_file_layout(nc)
        data, month = _read_raw(nc, field_name, layout, "2D_monthly",
                                time_to_read)
        if data.shape[0] != 12:
            raise ValueError(f"'{field_name}' in {filename}: expected 12 "
                             f"months, got {data.shape[0]}")
        return _remap_to_mesh(nc, layout, data, mesh, method).T  # [nV,12]


def read_field_from_file_3D(filename, field_name, mesh, time_to_read=None,
                            method=None):
    """[nV, nz] zeta-dimensioned field, vertically remapped onto the model
    zeta grid (read_field_from_file_3D)."""
    from ..remap.conservative import remap_vertical_1d
    with NCFile(filename) as nc:
        layout = inquire_file_layout(nc)
        data, zeta_src = _read_raw(nc, field_name, layout, "3D",
                                   time_to_read)
        on_mesh = _remap_to_mesh(nc, layout, data, mesh, method)  # [nz_src,nV]
    if len(zeta_src) == mesh.nz and np.allclose(zeta_src, mesh.zeta):
        return on_mesh.T
    return remap_vertical_1d(zeta_src, mesh.zeta, on_mesh.T)


def read_field_from_file_3D_ocean(filename, field_name, mesh, z_ocean,
                                  time_to_read=None, method=None):
    """[nV, nz_ocean] depth-dimensioned ocean field, vertically remapped
    onto z_ocean; depths with no source data are NaN-masked for the
    cavity-extrapolation step (read_field_from_file_3D_ocean)."""
    from ..remap.conservative import remap_vertical_1d
    with NCFile(filename) as nc:
        layout = inquire_file_layout(nc)
        data, depth_src = _read_raw(nc, field_name, layout, "3D_ocean",
                                    time_to_read)
        nan_cols = np.isnan(data).all(
            axis=tuple(range(1, data.ndim)))
        data = np.nan_to_num(data, nan=0.0)
        on_mesh = _remap_to_mesh(nc, layout, data, mesh, method)
    if len(depth_src) == len(z_ocean) and np.allclose(depth_src, z_ocean):
        return on_mesh.T
    mask_src = (~nan_cols).astype(int)
    return remap_vertical_1d(depth_src, z_ocean, on_mesh.T,
                             mask_src=mask_src)


def read_field_from_file_0D(filename, field_name, time_to_read=None):
    """Scalar (possibly time-dependent) value from a series file
    (netcdf_read_field_from_series_file.f90)."""
    with NCFile(filename) as nc:
        data = np.asarray(find_field(nc, field_name), dtype=np.float64)
        if data.ndim == 0 or len(data) == 1:
            return float(data.reshape(-1)[0])
        t = np.asarray(find_field(nc, "time"), dtype=np.float64)
        if time_to_read is None:
            return float(data[0])
        # linear interpolation in the series (reference series reader)
        return float(np.interp(time_to_read, t, data))


def read_series_from_file(filename, field_name):
    """(time, values) arrays from a series file."""
    with NCFile(filename) as nc:
        t = np.asarray(find_field(nc, "time"), dtype=np.float64)
        d = np.asarray(find_field(nc, field_name), dtype=np.float64)
    return t, d


def load_timeframe_series(filename, field_name, mesh, reader="2D",
                          z_ocean=None, t_window=None):
    """All timeframes of a field as (times [nt], frames [nt, ...]) for
    device-preloaded time interpolation (TPU-first replacement of the
    reference's 2-frame windows re-read from NetCDF, e.g.
    ocean_snapshot_plus_anomalies.f90 update_timeframes:125-180).

    reader: '2D' | '2D_monthly' | '3D_ocean'. t_window optionally
    restricts to frames covering [t0, t1] (one extra frame either side).
    """
    with NCFile(filename) as nc:
        t_all = np.asarray(find_field(nc, "time"), dtype=np.float64)
    idx = np.arange(len(t_all))
    if t_window is not None:
        i0 = max(0, int(np.searchsorted(t_all, t_window[0])) - 1)
        i1 = min(len(t_all), int(np.searchsorted(t_all, t_window[1])) + 2)
        idx = idx[i0:i1]
    read = {"2D": read_field_from_file_2D,
            "2D_monthly": read_field_from_file_2D_monthly,
            "3D_ocean": lambda f, n, m, time_to_read=None:
                read_field_from_file_3D_ocean(f, n, m, z_ocean,
                                              time_to_read=time_to_read),
            }[reader]
    frames = [read(filename, field_name, mesh, time_to_read=float(t_all[i]))
              for i in idx]
    return t_all[idx], np.stack(frames)
