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


# -- field-name aliases (reference netcdf_field_name_options.f90) ------------

FIELD_ALIASES = {
    "Hi": ["Hi", "thickness", "lithk"],
    "Hb": ["Hb", "bed", "topg"],
    "Hs": ["Hs", "surface", "orog"],
    "SL": ["SL", "sealevel"],
    "x": ["x", "X", "x1", "nx"],
    "y": ["y", "Y", "y1", "ny"],
    "time": ["time", "Time", "t"],
}


def find_field(nc: NCFile, canonical: str):
    """Resolve a field by its accepted aliases (read-and-remap input)."""
    for alias in FIELD_ALIASES.get(canonical, [canonical]):
        if nc.has(alias):
            return nc.read(alias)
    raise KeyError(f"no variable matching '{canonical}' in {nc.path}")
