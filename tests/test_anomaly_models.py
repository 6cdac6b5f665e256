"""Snapshot-plus-anomalies forcing models (climate / ocean / SMB): the
ISMIP6-style aSMB/aST forcing path with device-preloaded anomaly series."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.io.ncio import NCFile


@pytest.fixture(scope="module")
def setup():
    from ufemism2_tpu.mesh import build_uniform_mesh
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    mesh = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 10e3)
    md = build_mesh_data(mesh)
    return mesh, md


def _grid_axes(nc, n=21):
    x = np.linspace(-60e3, 60e3, n)
    nc.def_dim("x", n)
    nc.def_var("x", ("x",))
    nc.put("x", x)
    nc.def_dim("y", n)
    nc.def_var("y", ("y",))
    nc.put("y", x)
    return x


class _S:
    def __init__(self, nV):
        self.Hi = jnp.full(nV, 500.0)
        self.Hb = jnp.full(nV, -600.0)
        self.SL = jnp.zeros(nV)
        self.Hib = jnp.full(nV, -440.0)
        self.Hs = jnp.full(nV, 60.0)
        self.divQ = jnp.zeros(nV)


def test_smb_snapshot_plus_anomalies(tmp_path, setup):
    mesh, md = setup
    snap = str(tmp_path / "smb_snap.nc")
    with NCFile(snap, "w") as nc:
        x = _grid_axes(nc)
        nc.def_var("SMB", ("x", "y"))
        nc.put("SMB", np.full((21, 21), 0.5))
    anml = str(tmp_path / "smb_anml.nc")
    with NCFile(anml, "w") as nc:
        x = _grid_axes(nc)
        nc.def_dim("time", 3)
        nc.def_var("time", ("time",))
        nc.put("time", np.array([0.0, 100.0, 200.0]))
        nc.def_var("SMB_anomaly", ("time", "x", "y"))
        nc.put("SMB_anomaly",
               np.stack([np.zeros((21, 21)), np.full((21, 21), -1.0),
                         np.full((21, 21), -2.0)]))

    class C:
        choice_SMB_model_ANT = "snapshot_plus_anomalies"
        SMB_snp_p_anml_filename_snapshot_SMB = snap
        SMB_snp_p_anml_filename_anomalies = anml
    from ufemism2_tpu.models.smb import make_run_smb
    run = make_run_smb(C, md, "ANT")
    assert float(np.asarray(run(0.0)).mean()) == pytest.approx(0.5, abs=1e-6)
    assert float(np.asarray(run(50.0)).mean()) == pytest.approx(0.0,
                                                                abs=1e-6)
    assert float(np.asarray(run(999.0)).mean()) == pytest.approx(-1.5,
                                                                 abs=1e-6)


def test_ocean_snapshot_plus_anomalies(tmp_path, setup):
    mesh, md = setup
    depth = np.array([100.0, 500.0, 1000.0])
    snap = str(tmp_path / "oc_snap.nc")
    with NCFile(snap, "w") as nc:
        x = _grid_axes(nc)
        nc.def_dim("depth", 3)
        nc.def_var("depth", ("depth",))
        nc.put("depth", depth)
        nc.def_var("t_an", ("depth", "x", "y"))
        nc.put("t_an", np.full((3, 21, 21), -1.0))
        nc.def_var("s_an", ("depth", "x", "y"))
        nc.put("s_an", np.full((3, 21, 21), 34.5))
    anml = str(tmp_path / "oc_anml.nc")
    with NCFile(anml, "w") as nc:
        x = _grid_axes(nc)
        nc.def_dim("depth", 3)
        nc.def_var("depth", ("depth",))
        nc.put("depth", depth)
        nc.def_dim("time", 2)
        nc.def_var("time", ("time",))
        nc.put("time", np.array([0.0, 100.0]))
        nc.def_var("temperature_anomaly", ("time", "depth", "x", "y"))
        nc.put("temperature_anomaly",
               np.stack([np.zeros((3, 21, 21)), np.full((3, 21, 21), 2.0)]))
        nc.def_var("salinity_anomaly", ("time", "depth", "x", "y"))
        nc.put("salinity_anomaly", np.zeros((2, 3, 21, 21)))

    class C:
        choice_ocean_model_ANT = "snapshot_plus_anomalies"
        ocean_snp_p_anml_filename_snapshot = snap
        ocean_snp_p_anml_filename_anomalies = anml
        ocean_vertical_grid_dz = 250.0
        ocean_vertical_grid_max_depth = 1000.0
        choice_ocean_extrapolation_method = "initialisation"
        choice_refgeo_init_ANT = "idealised"
        choice_refgeo_init_idealised = "flatearth"
        refgeo_Hi_min = 2.0
    from ufemism2_tpu.models.ocean import make_run_ocean
    run = make_run_ocean(C, md, "ANT", mesh=mesh)
    s = _S(md.nV)
    T_mid0 = float(np.asarray(run(0.0, s)["T"]).mean())
    T_mid1 = float(np.asarray(run(100.0, s)["T"]).mean())
    assert T_mid1 == pytest.approx(T_mid0 + 2.0, abs=1e-6)


def test_climate_snapshot_plus_anomalies(tmp_path, setup):
    mesh, md = setup
    snap = str(tmp_path / "cl_snap.nc")
    with NCFile(snap, "w") as nc:
        x = _grid_axes(nc)
        nc.def_dim("month", 12)
        nc.def_var("month", ("month",))
        nc.put("month", np.arange(1.0, 13.0))
        nc.def_var("Hs", ("x", "y"))
        nc.put("Hs", np.zeros((21, 21)))
        nc.def_var("T2m", ("month", "x", "y"))
        nc.put("T2m", np.full((12, 21, 21), 250.0))
        nc.def_var("Precip", ("month", "x", "y"))
        nc.put("Precip", np.full((12, 21, 21), 0.05))
    anml = str(tmp_path / "cl_anml.nc")
    with NCFile(anml, "w") as nc:
        x = _grid_axes(nc)
        nc.def_dim("month", 12)
        nc.def_var("month", ("month",))
        nc.put("month", np.arange(1.0, 13.0))
        nc.def_dim("time", 2)
        nc.def_var("time", ("time",))
        nc.put("time", np.array([0.0, 100.0]))
        nc.def_var("T2m_anomaly", ("time", "month", "x", "y"))
        nc.put("T2m_anomaly",
               np.stack([np.zeros((12, 21, 21)),
                         np.full((12, 21, 21), 5.0)]))
        nc.def_var("Precip_anomaly", ("time", "month", "x", "y"))
        nc.put("Precip_anomaly", np.zeros((2, 12, 21, 21)))

    class C:
        choice_climate_model_ANT = "snapshot_plus_anomalies"
        climate_snp_p_anml_filename_snapshot_ANT = snap
        climate_snp_p_anml_filename_anomalies_ANT = anml
    from ufemism2_tpu.models.climate import make_run_climate
    run = make_run_climate(C, md, "ANT", mesh=mesh)
    T0_ = float(np.asarray(run(0.0)["T2m"]).mean())
    T1_ = float(np.asarray(run(100.0)["T2m"]).mean())
    assert T1_ == pytest.approx(T0_ + 5.0, abs=1e-6)
