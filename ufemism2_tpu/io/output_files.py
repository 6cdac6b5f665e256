"""Regional output files: main mesh output, scalar time series, restart.

Re-design of src/UFEMISM/io/main_regional_output/ (mesh_output_files.f90,
scalar_output_files.f90): NetCDF4(HDF5) files with the reference's variable
names, so the reference's MATLAB/python analysis scripts
(read_stability_info.m, compare_all_netcdfs_in_test_folder.py) work on our
outputs directly.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .ncio import NCFile


MESH_FIELDS_DEFAULT = ["Hi", "Hb", "Hs", "Hib", "SL", "dHi_dt",
                       "u_vav_b", "v_vav_b", "uabs_vav_b", "divQ",
                       "fraction_gr", "Ti_base"]


def setup_mesh_in_file(nc: NCFile, mesh):
    """Write the mesh description (netcdf_setup_grid_mesh_in_file.f90)."""
    nc.def_dim("vi", mesh.nV)
    nc.def_dim("ti", mesh.nTri)
    nc.def_dim("ei", mesh.nE)
    nc.def_dim("two", 2)
    nc.def_dim("three", 3)
    nc.def_dim("zeta", mesh.nz)
    nc.def_var("V", ("vi", "two"), units="m")
    nc.put("V", mesh.V)
    nc.def_var("Tri", ("ti", "three"))
    nc.put("Tri", mesh.Tri.astype(np.float64) + 1)  # 1-based like reference
    nc.def_var("TriGC", ("ti", "two"), units="m")
    nc.put("TriGC", mesh.TriGC)
    nc.def_var("A", ("vi",), units="m^2")
    nc.put("A", mesh.A)
    nc.def_var("R", ("vi",), units="m")
    nc.put("R", mesh.R)
    nc.def_var("zeta", ("zeta",))
    nc.put("zeta", mesh.zeta)


class MeshOutputFile:
    """Time-series output of mesh fields (main_output_ANT_00001.nc style)."""

    def __init__(self, path, mesh, fields=MESH_FIELDS_DEFAULT):
        self.nc = NCFile(path, "w")
        self.fields = fields
        setup_mesh_in_file(self.nc, mesh)
        self.nc.def_dim("time", None)
        self.nc.def_var("time", ("time",), units="years")
        for f in fields:
            grid = "ti" if f.endswith("_b") else "vi"
            self.nc.def_var(f, ("time", grid))

    def write(self, time, state_fields: dict):
        first = True
        for f in self.fields:
            if f not in state_fields:
                continue
            self.nc.append(f, np.asarray(state_fields[f]),
                           coord=time if first else None)
            first = False
        self.nc.h5.flush()

    def close(self):
        self.nc.close()


SCALAR_FIELDS = ["ice_area", "ice_volume", "ice_volume_af",
                 "SMB_total", "BMB_total", "LMB_total",
                 "dt_ice", "n_visc_its", "n_Axb_its"]


class ScalarOutputFile:
    """Buffered scalar time series (scalar_output_ANT_00001.nc)."""

    def __init__(self, path):
        self.nc = NCFile(path, "w")
        self.nc.def_dim("time", None)
        self.nc.def_var("time", ("time",), units="years")
        for f in SCALAR_FIELDS:
            self.nc.def_var(f, ("time",))

    def write(self, time, scalars: dict):
        first = True
        for f in SCALAR_FIELDS:
            if f not in scalars:
                continue
            self.nc.append(f, float(scalars[f]),
                           coord=time if first else None)
            first = False
        self.nc.h5.flush()

    def close(self):
        self.nc.close()


def write_restart_file(path, mesh, state, time):
    """Full-state restart (per-component restart files in the reference;
    one consolidated pytree dump here, plus reference-named fields)."""
    with NCFile(path, "w") as nc:
        setup_mesh_in_file(nc, mesh)
        nc.def_dim("time", None)
        nc.def_var("time", ("time",), units="years")
        for name in ["Hi", "Hb", "SL", "dHi_dt", "Ti"]:
            arr = np.asarray(getattr(state, name))
            if arr.ndim == 1:
                nc.def_var(name, ("time", "vi"))
            else:
                nc.def_var(name, ("time", "vi", "zeta"))
            nc.append(name, arr, coord=time if name == "Hi" else None)
