"""Minimal NetCDF4 file I/O over HDF5 (h5py).

TPU-native replacement for the reference's NetCDF-Fortran layer
(src/UPSY/io/netcdf_basic/): the environment ships h5py but not netCDF4, and
NetCDF4 files ARE HDF5 files following the dimension-scale convention, so we
read/write that convention directly. Files written here open unmodified in
netCDF4-python/xarray/MATLAB ncread (the reference's analysis scripts).

Write API mirrors the tiny subset the model needs:

    with NCFile(path, "w") as nc:
        nc.def_dim("vi", nV)
        nc.def_var("Hi", ("time", "vi"), units="m")
        nc.append("Hi", Hi)          # grows the unlimited 'time' dimension

Reading handles both our files and reference-produced NetCDF files.
"""

from __future__ import annotations

import numpy as np
import h5py

_NC_DIMENSION_HINT = "This is a netCDF dimension but not a netCDF variable."


class NCFile:
    def __init__(self, path, mode="r"):
        self.path = str(path)
        self.h5 = h5py.File(self.path, mode)
        self._dims: dict[str, int | None] = {}
        if mode == "r":
            self._scan_dims()

    # -- write side ---------------------------------------------------------

    def def_dim(self, name: str, size: int | None = None):
        """Define a dimension; size None = unlimited."""
        self._dims[name] = size
        if name in self.h5:
            return
        n = 0 if size is None else size
        maxshape = (None,) if size is None else (size,)
        d = self.h5.create_dataset(name, shape=(n,), maxshape=maxshape,
                                   dtype="f8")
        d.make_scale(name)
        if size is None:
            d.attrs["NAME"] = np.bytes_(f"{_NC_DIMENSION_HINT} {n}")

    def def_var(self, name: str, dims: tuple, dtype="f8", **attrs):
        if name in self.h5:
            return self.h5[name]
        shape = tuple(0 if self._dims.get(d) is None else self._dims[d]
                      for d in dims)
        maxshape = tuple(None if self._dims.get(d) is None else self._dims[d]
                         for d in dims)
        v = self.h5.create_dataset(name, shape=shape, maxshape=maxshape,
                                   dtype=dtype)
        for i, d in enumerate(dims):
            v.dims[i].attach_scale(self.h5[d])
        for k, val in attrs.items():
            v.attrs[k] = val
        v.attrs["_dims"] = np.bytes_(",".join(dims))
        return v

    def put(self, name: str, data, **attrs):
        """Write a full (fixed-size) variable, defining dims from shape if
        it was def_var'd already."""
        data = np.asarray(data)
        v = self.h5[name]
        if v.shape != data.shape:
            v.resize(data.shape)
        v[...] = data
        for k, val in attrs.items():
            v.attrs[k] = val

    def append(self, name: str, data, coord=None, coord_name="time"):
        """Append one record along the variable's first (unlimited) dim."""
        data = np.asarray(data)
        v = self.h5[name]
        n = v.shape[0]
        v.resize((n + 1,) + v.shape[1:])
        v[n, ...] = data
        if coord is not None:
            t = self.h5[coord_name]
            if t.shape[0] <= n:
                t.resize((n + 1,))
            t[n] = coord

    # -- read side ----------------------------------------------------------

    def _scan_dims(self):
        for k in self.h5:
            ds = self.h5[k]
            if isinstance(ds, h5py.Dataset) and ds.attrs.get("CLASS") == b"DIMENSION_SCALE":
                self._dims[k] = ds.shape[0]

    def read(self, name: str) -> np.ndarray:
        return self.h5[name][...]

    def variables(self):
        out = []
        for k in self.h5:
            ds = self.h5[k]
            if isinstance(ds, h5py.Dataset) and \
                    ds.attrs.get("CLASS") != b"DIMENSION_SCALE":
                out.append(k)
        return out

    def has(self, name) -> bool:
        return name in self.h5

    def dim_names(self, name: str) -> list:
        """Dimension names of a variable, in storage order.

        Uses the '_dims' attribute for files we wrote, falling back to the
        HDF5 dimension-scale lists netCDF4 writes."""
        v = self.h5[name]
        if "_dims" in v.attrs:
            raw = v.attrs["_dims"]
            if isinstance(raw, bytes):
                raw = raw.decode()
            return raw.split(",")
        names = []
        for i in range(v.ndim):
            try:
                scales = [s.name.lstrip("/") for s in v.dims[i]
                          if s.name is not None]
            except Exception:
                scales = []
            names.append(scales[0] if scales else "")
        return names

    def dims(self) -> dict:
        """All dimension names -> sizes found in the file."""
        return dict(self._dims)

    def attrs(self, name: str) -> dict:
        return dict(self.h5[name].attrs)

    def set_global_attrs(self, **attrs):
        for k, v in attrs.items():
            self.h5.attrs[k] = v

    def close(self):
        self.h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


# -- field-name aliases -------------------------------------------------------
# Alias lists are data parity with the reference's accepted input spellings
# (netcdf_field_name_options.f90:83-150, '||'-separated options), required so
# the same input files load in both frameworks.

FIELD_ALIASES = {
    "x": ["x", "X", "x1", "X1", "nx", "NX", "x-coordinate", "X-coordinate",
          "easting", "Easting"],
    "y": ["y", "Y", "y1", "Y1", "ny", "NY", "y-coordinate", "Y-coordinate",
          "northing", "Northing"],
    "zeta": ["zeta", "Zeta"],
    "lon": ["lon", "Lon", "long", "Long", "longitude", "Longitude"],
    "lat": ["lat", "Lat", "latitude", "Latitude"],
    "time": ["time", "Time", "t", "nt"],
    "month": ["month", "Month"],
    "depth": ["depth", "Depth"],
    "Hi": ["Hi", "thickness", "lithk", "ice_thickness"],
    "Hb": ["Hb", "bed", "topg", "bed_topography"],
    "Hs": ["Hs", "surface", "orog", "surface_topography"],
    "SL": ["SL", "sealevel"],
    "dHdt": ["dHdt", "dHi_dt"],
    "hflux": ["hflux", "GHF", "ghf", "geothermal_heat_flux"],
    "dHb": ["dHb"],
    "Ti": ["Ti"],
    "T_ocean": ["T_ocean", "t_ocean", "t_an", "votemper"],
    "S_ocean": ["S_ocean", "s_ocean", "s_an", "vosaline"],
    "dT_ocean": ["dT", "dT_ocean", "dTo"],
    "dT_atmosphere": ["dT", "dT_atmosphere", "dT_atm", "dTa"],
    "insolation": ["Q_TOA"],
    "sealevel": ["SL", "sea_level", "sl"],
    "GI": ["GI", "gi", "Glacial_Index", "glacial_index", "GlacialIndex"],
    "CO2": ["CO2", "co2"],
    "T2m": ["T2m", "T_2m", "Temp", "temp", "temperature", "tas"],
    "Precip": ["Precip", "precip", "precipitation", "pr"],
    "SMB": ["SMB", "smb", "acab"],
    "BMB": ["BMB", "bmb", "libmassbf"],
}


def resolve_field_name(nc: NCFile, canonical: str):
    """Resolve the name under which a canonical field appears in the file.

    `canonical` may itself be a '||'-separated list of acceptable names
    (the reference passes such strings straight through the API).
    """
    if "||" in canonical:
        options = canonical.split("||")
    else:
        options = FIELD_ALIASES.get(canonical, [canonical])
    for alias in options:
        if nc.has(alias):
            return alias
    return None


def find_field(nc: NCFile, canonical: str):
    """Resolve a field by its accepted aliases (read-and-remap input)."""
    name = resolve_field_name(nc, canonical)
    if name is None:
        raise KeyError(f"no variable matching '{canonical}' in {nc.path}")
    return nc.read(name)
