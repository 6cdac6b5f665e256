"""Mesh updates with open output files: the mesh output rotates to the
next numbered generation (reference: a fresh main_output_<R>_0000N.nc
per mesh update, main_regional_output.f90) while the mesh-independent
files (scalar, gridded) stay open and keep their history. Regression for
the h5py 'truncate a file which is already open' crash that killed the
MISMIP+ 5 km spinup gate at its first remesh (2026-08-18)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config
from ufemism2_tpu.io.ncio import NCFile


@pytest.mark.slow
def test_mesh_update_rotates_output_generation(tmp_path):
    from ufemism2_tpu.main.region import ModelRegion
    C = Config(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="Halfar",
        dx_refgeo_init_idealised=50e3,
        refgeo_idealised_Halfar_H0=3000.0,
        refgeo_idealised_Halfar_R0=500e3,
        uniform_Glens_flow_factor=1e-16,
        choice_ice_rheology_Glen="uniform",
        choice_stress_balance_approximation="SIA",
        choice_sliding_law="no_sliding",
        xmin_ANT=-750e3, xmax_ANT=750e3, ymin_ANT=-750e3, ymax_ANT=750e3,
        maximum_resolution_uniform=150e3,
        maximum_resolution_grounded_ice=150e3,
        maximum_resolution_ice_front=100e3, ice_front_width=100e3,
        start_time_of_run=0.0, end_time_of_run=30.0,
        dt_output=5.0, dt_output_restart=1e9,
        nit_Lloyds_algorithm=2, refgeo_Hi_min=2.0,
        tpu_precision="f32")
    r = ModelRegion(C, "ANT", output_dir=tmp_path)
    r.run_to(10.0)
    r.write_output()
    r.update_mesh()          # must rotate, not truncate-while-open
    r.run_to(20.0)
    r.write_output()

    gen1 = tmp_path / "main_output_ANT_00001.nc"
    gen2 = tmp_path / "main_output_ANT_00002.nc"
    assert gen1.exists() and gen2.exists()
    r.mesh_out.close()
    f2 = NCFile(gen2, "r")
    # generation 2 is written on the NEW mesh with post-update frames
    assert f2.h5["Hi"].shape[1] == r.mesh.nV
    assert float(f2.h5["time"][-1]) >= 10.0
    f2.close()

    # scalar file keeps pre-update history (it is not rotated)
    r.scalar_out.close()
    fs = NCFile(tmp_path / "scalar_output_ANT_00001.nc", "r")
    t = np.asarray(fs.h5["time"][:])
    assert t.min() <= 5.0 and t.max() >= 10.0
    fs.close()

    # a fresh process resuming into this dir starts generation 3
    # instead of truncating generation 1 (close the first region's
    # remaining handles — a real fresh process holds none)
    r.grid_out.close()
    r2 = ModelRegion(C, "ANT", output_dir=tmp_path)
    r2._open_outputs()
    assert r2._out_gen == 3
    assert (tmp_path / "main_output_ANT_00003.nc").exists()
    f1 = NCFile(gen1, "r")
    assert f1.h5["time"].shape[0] > 0    # gen-1 frames survived
    f1.close()
