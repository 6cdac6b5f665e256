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


# reference-named fields that live on the triangle (b) grid without the
# _b suffix (the reference stores all velocities on triangles)
B_GRID_FIELDS = {"u_surf", "v_surf", "uabs_surf",
                 "u_base", "v_base", "uabs_base"}


def _is_b_grid(name):
    return name.endswith("_b") or name in B_GRID_FIELDS


MESH_FIELDS_DEFAULT = ["Hi", "Hb", "Hs", "Hib", "SL", "dHi_dt",
                       "u_vav_b", "v_vav_b", "uabs_vav_b", "divQ",
                       "fraction_gr", "Ti_base",
                       # reference-compatible surface-velocity names
                       # (main_regional_output.f90 default set; vertex
                       # staggering here vs the reference's triangles)
                       "u_surf", "v_surf", "uabs_surf"]


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
            grid = "ti" if _is_b_grid(f) else "vi"
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
                 "SMB_total", "SMB_gr", "SMB_fl", "SMB_land", "SMB_ocean",
                 "BMB_total", "BMB_gr", "BMB_fl",
                 "LMB_total", "LMB_gr", "LMB_fl", "AMB_total",
                 "gl_flux", "cf_gr_flux", "cf_fl_flux",
                 "margin_land_flux", "margin_ocean_flux", "dV_dt",
                 "dt_ice", "n_visc_its", "n_Axb_its"]


class ScalarOutputFile:
    """Buffered scalar time series (scalar_output_ANT_00001.nc)."""

    def __init__(self, path, fields=None):
        self.fields = fields or SCALAR_FIELDS
        self.nc = NCFile(path, "w")
        self.nc.def_dim("time", None)
        self.nc.def_var("time", ("time",), units="years")
        for f in self.fields:
            self.nc.def_var(f, ("time",))

    def write(self, time, scalars: dict):
        first = True
        for f in self.fields:
            if f not in scalars:
                continue
            self.nc.append(f, float(scalars[f]),
                           coord=time if first else None)
            first = False
        self.nc.h5.flush()

    def close(self):
        self.nc.close()


def _state_leaves(state):
    """Flat {name: array} view of the IceState pytree (pc.* prefixed),
    the generic restart/remap field walk (the reference's per-component
    write_to_restart_file set, predictor_corrector_scheme.f90:510-620)."""
    import dataclasses
    out = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if dataclasses.is_dataclass(v):
            for g in dataclasses.fields(v):
                out[f"pc.{g.name}"] = getattr(v, g.name)
        else:
            out[f.name] = v
    return out


def _dims_for(arr, mesh):
    lead = {mesh.nV: "vi", mesh.nTri: "ti", mesh.nE: "ei"}
    if arr.ndim == 0:
        return ()
    d0 = lead.get(arr.shape[0])
    if d0 is None:
        raise ValueError(f"cannot map shape {arr.shape} to mesh dims")
    if arr.ndim == 1:
        return (d0,)
    if arr.shape[1] == mesh.nz:
        return (d0, "zeta")
    if arr.shape[1] == 12:
        return (d0, "month")
    raise ValueError(f"cannot map shape {arr.shape} to mesh dims")


def write_restart_file(path, mesh, state, time):
    """Full-state restart: every IceState field (incl. the pc controller
    state, so the adaptive dt resumes exactly -
    predictor_corrector_scheme.f90:417-444) on the current mesh."""
    leaves = _state_leaves(state)
    with NCFile(path, "w") as nc:
        setup_mesh_in_file(nc, mesh)
        nc.def_dim("month", 12)
        nc.h5.create_dataset("time", data=np.array([time]))
        for name, v in leaves.items():
            arr = np.asarray(v)
            key = name.replace(".", "_")
            if arr.dtype == bool:
                arr = arr.astype(np.int8)
            if arr.ndim == 0:
                nc.h5.create_dataset(key, data=arr)
                continue
            nc.def_var(key, _dims_for(arr, mesh), dtype=arr.dtype)
            nc.put(key, arr)
        nc.set_global_attrs(restart_time=float(time), nV=mesh.nV,
                            nTri=mesh.nTri)


def load_restart_file(path):
    """(time, {field: np.ndarray}) from a restart file written by
    write_restart_file; 'pc_*' keys hold the pc-controller state."""
    with NCFile(path) as nc:
        time = float(np.asarray(nc.read("time")).reshape(-1)[0])
        fields = {}
        skip = {"V", "Tri", "TriGC", "A", "R", "zeta", "time", "time_r"}
        for k in nc.h5:
            import h5py as _h5
            ds = nc.h5[k]
            if not isinstance(ds, _h5.Dataset) or k in skip:
                continue
            if ds.attrs.get("CLASS") == b"DIMENSION_SCALE":
                continue
            fields[k] = ds[...]
    return time, fields


def restore_state_from_restart(state, path, mesh=None):
    """IceState with every field (incl. pc controller) replaced from a
    restart file. The restart mesh must match the current one (mesh
    updates recreate restart files in the reference too,
    UFEMISM_main_model.f90:320-329)."""
    import dataclasses
    import jax.numpy as jnp
    time, fields = load_restart_file(path)

    def cast(old, new):
        arr = jnp.asarray(new)
        if old.dtype == jnp.bool_:
            return arr.astype(bool)
        return arr.astype(old.dtype).reshape(old.shape)

    updates = {}
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        if dataclasses.is_dataclass(v):
            pc_updates = {}
            for g in dataclasses.fields(v):
                key = f"pc_{g.name}"
                if key in fields:
                    pc_updates[g.name] = cast(getattr(v, g.name),
                                              fields[key])
            if pc_updates:
                updates[f.name] = v.replace(**pc_updates)
        elif f.name in fields:
            updates[f.name] = cast(v, fields[f.name])
    return time, state.replace(**updates)


class GridOutputFile:
    """Gridded main output (main_output_<R>_grid.nc,
    grid_output_files.f90): the mesh fields conservatively remapped onto
    the square output grid at dx_output_grid_<R>; variables use the
    reference's names so its analysis tooling reads the files directly."""

    def __init__(self, path, mesh, grid, fields=None):
        from ..remap.atlas import get_map
        self.grid = grid
        self.fields = fields or MESH_FIELDS_DEFAULT
        self.M_a = get_map(mesh, grid)                 # vertices -> grid
        from ..remap.conservative import build_map_nearest
        self.M_b = build_map_nearest(mesh.TriGC, grid.centres(), mesh.nTri)
        self.nc = NCFile(path, "w")
        self.nc.def_dim("x", grid.nx)
        self.nc.def_var("x", ("x",), units="m")
        self.nc.put("x", grid.x)
        self.nc.def_dim("y", grid.ny)
        self.nc.def_var("y", ("y",), units="m")
        self.nc.put("y", grid.y)
        self.nc.def_dim("time", None)
        self.nc.def_var("time", ("time",), units="years")
        for f in self.fields:
            self.nc.def_var(f, ("time", "y", "x"))

    def update_mesh(self, mesh):
        """Rebuild the mesh->grid maps after a mesh update; the file
        and its history stay (grid output spans mesh generations)."""
        from ..remap.atlas import get_map
        from ..remap.conservative import build_map_nearest
        self.M_a = get_map(mesh, self.grid)
        self.M_b = build_map_nearest(mesh.TriGC, self.grid.centres(),
                                     mesh.nTri)

    def write(self, time, state_fields: dict):
        first = True
        for f in self.fields:
            if f not in state_fields:
                continue
            v = np.asarray(state_fields[f])
            M = self.M_b if _is_b_grid(f) else self.M_a
            g = (M @ v).reshape(self.grid.nx, self.grid.ny).T   # [ny, nx]
            # bound-preserving limiter: the 2nd-order conservative map
            # has no monotonicity constraint, so clamp to the source
            # field's range (the parity harness caught gridded Hi
            # dipping to -60 m / overshooting the dome summit)
            g = np.clip(g, v.min(), v.max())
            self.nc.append(f, g, coord=time if first else None)
            first = False
        self.nc.h5.flush()

    def close(self):
        self.nc.close()
