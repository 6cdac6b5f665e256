"""Climate matrix method (Berends et al. 2018): warm/cold snapshot
interpolation driven by CO2 + absorbed insolation, with bias correction
and precipitation downscaling - on fully synthetic inputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.io.ncio import NCFile


def _write_snapshot(path, T_base, with_winds=True, Hs0=0.0, ocean_r=None):
    """`ocean_r`: grid points beyond this radius get Hs = 0 (open ocean).
    The model marks ocean via the reference's exact `Hs == MINVAL(Hs)`
    criterion (climate_matrix.f90:804), so the snapshot MUST contain a
    region that is exactly the minimum after bilinear interpolation —
    cells whose four corners are all 0 interpolate to exactly 0. A
    spatially uniform Hs is degenerate for that criterion: roundoff
    decides which vertices hit the min, and the absorbed-insolation
    averages become mesh-dependent."""
    n = 17
    x = np.linspace(-60e3, 60e3, n)
    with NCFile(path, "w") as nc:
        nc.def_dim("x", n)
        nc.def_var("x", ("x",))
        nc.put("x", x)
        nc.def_dim("y", n)
        nc.def_var("y", ("y",))
        nc.put("y", x)
        nc.def_dim("month", 12)
        nc.def_var("month", ("month",))
        nc.put("month", np.arange(1.0, 13.0))
        Hs = np.full((n, n), Hs0)
        if ocean_r is not None:
            xx, yy = np.meshgrid(x, x, indexing="ij")
            Hs = np.where(np.hypot(xx, yy) > ocean_r, 0.0, Hs)
        nc.def_var("Hs", ("x", "y"))
        nc.put("Hs", Hs)
        nc.def_var("T2m", ("month", "x", "y"))
        nc.put("T2m", np.full((12, n, n), T_base))
        nc.def_var("Precip", ("month", "x", "y"))
        nc.put("Precip", np.full((12, n, n), 0.04))
        if with_winds:
            nc.def_var("Wind_WE", ("month", "x", "y"))
            nc.put("Wind_WE", np.full((12, n, n), 2.0))
            nc.def_var("Wind_SN", ("month", "x", "y"))
            nc.put("Wind_SN", np.full((12, n, n), 1.0))


def _write_insolation(path):
    lon = np.arange(0.0, 360.0, 30.0)
    lat = np.arange(-90.0, 91.0, 15.0)
    t = np.array([-30000.0, -21000.0, 0.0])
    Q = np.full((3, 12, len(lon), len(lat)), 300.0)
    Q[1] -= 20.0     # colder orbit at the LGM frame
    with NCFile(path, "w") as nc:
        nc.def_dim("time", 3)
        nc.def_var("time", ("time",))
        nc.put("time", t)
        nc.def_dim("month", 12)
        nc.def_var("month", ("month",))
        nc.put("month", np.arange(1.0, 13.0))
        nc.def_dim("lon", len(lon))
        nc.def_var("lon", ("lon",))
        nc.put("lon", lon)
        nc.def_dim("lat", len(lat))
        nc.def_var("lat", ("lat",))
        nc.put("lat", lat)
        nc.def_var("Q_TOA", ("time", "month", "lon", "lat"))
        nc.put("Q_TOA", Q)


def _write_co2(path):
    with NCFile(path, "w") as nc:
        nc.def_dim("time", 3)
        nc.def_var("time", ("time",))
        nc.put("time", np.array([-30000.0, -21000.0, 0.0]))
        nc.def_var("CO2", ("time",))
        nc.put("CO2", np.array([230.0, 190.0, 280.0]))


@pytest.mark.slow
def test_climate_matrix_interpolates_with_co2(tmp_path):
    from ufemism2_tpu.mesh import build_uniform_mesh
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    from ufemism2_tpu.mesh.projections import inverse_oblique_sg_projection
    from ufemism2_tpu.models.climate_matrix import make_run_climate_matrix
    from ufemism2_tpu.config import Config

    mesh = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 12e3)
    mesh.proj = (0.0, -90.0, 71.0)
    mesh.lon, mesh.lat = inverse_oblique_sg_projection(
        mesh.V[:, 0], mesh.V[:, 1], *mesh.proj)
    md = build_mesh_data(mesh)

    pd = str(tmp_path / "pd.nc")
    pi = str(tmp_path / "pi.nc")
    warm = str(tmp_path / "warm.nc")
    cold = str(tmp_path / "cold.nc")
    # consistent geometry: a grounded-ice interior disc with an open
    # ocean ring beyond 40 km — the snapshot albedo spin-up marks ocean
    # via the exact-min criterion (see _write_snapshot), and the model
    # state below puts ice-free ocean on the same vertices so the
    # modelled absorbed insolation matches the warm snapshot's
    _write_snapshot(pd, 268.0, Hs0=200.0, ocean_r=40e3)
    _write_snapshot(pi, 268.0, Hs0=200.0, ocean_r=40e3)  # PI == PD
    _write_snapshot(warm, 268.0, Hs0=200.0, ocean_r=40e3)
    _write_snapshot(cold, 248.0, Hs0=200.0, ocean_r=40e3)
    ins = str(tmp_path / "ins.nc")
    _write_insolation(ins)
    co2 = str(tmp_path / "co2.nc")
    _write_co2(co2)

    C = Config(
        choice_climate_model_ANT="matrix",
        climate_matrix_filename_PD_obs_climate=pd,
        climate_matrix_filename_climate_snapshot_PI=pi,
        climate_matrix_filename_climate_snapshot_warm=warm,
        climate_matrix_filename_climate_snapshot_cold=cold,
        choice_matrix_forcing="CO2_direct",
        filename_CO2_record=co2,
        choice_insolation_forcing="realistic",
        filename_insolation=ins,
        start_time_of_run=-25000.0, end_time_of_run=0.0,
        climate_matrix_warm_orbit_time=0.0,
        climate_matrix_cold_orbit_time=-21000.0,
    )
    run = make_run_climate_matrix(C, md, "ANT", mesh)

    # model geometry on the same ocean mask the snapshot spin-up saw
    # (exact-min criterion on the interpolated snapshot Hs), so the
    # modelled albedo matches the snapshot albedo vertex-for-vertex
    Hs_snap = np.asarray(run.warm["Hs"])
    ocean = Hs_snap == Hs_snap.min()

    class S:
        Hi = jnp.where(ocean, 0.0, 200.0)
        Hb = jnp.where(ocean, -1000.0, 0.0)
        SL = jnp.full(md.nV, -100.0)
        Hs = jnp.where(ocean, 0.0, 200.0)
    s = S()
    out_pd = run(0.0, s)          # CO2 = 280 -> warm end
    out_lgm = run(-21000.0, s)    # CO2 = 190 -> cold end
    T_pd = float(np.asarray(out_pd["T2m"]).mean())
    T_lgm = float(np.asarray(out_lgm["T2m"]).mean())
    # glacial CO2 must pull the climate towards the cold snapshot
    assert T_lgm < T_pd - 5.0
    assert T_pd == pytest.approx(268.0, abs=4.0)
    assert np.isfinite(np.asarray(out_pd["Precip"])).all()
    assert (np.asarray(out_pd["Precip"]) >= 0).all()
    assert out_pd["Q_TOA"].shape == (md.nV, 12)
