"""Input file reading: geometry / forcing fields onto the model mesh.

Re-design of src/UPSY/io/netcdf_input/ + read_and_remap: read gridded
NetCDF fields (via the h5py NetCDF layer) and remap them onto the model
mesh. Full conservative read-and-remap arrives with the remapping module;
currently nearest/bilinear sampling of x/y-gridded files.
"""

from __future__ import annotations

import numpy as np

from .ncio import NCFile, find_field


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
    return (F[xi, yi] * (1 - wx) * (1 - wy)
            + F[xi + 1, yi] * wx * (1 - wy)
            + F[xi, yi + 1] * (1 - wx) * wy
            + F[xi + 1, yi + 1] * wx * wy)


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
