"""Realistic climate / ocean / SMB forcing models: snapshot reading,
lapse-rate downscaling, transient deltaT, insolation, cavity
extrapolation, IMAU-ITM firn/albedo cycle.

Mirrors src/UFEMISM/validation/unit_tests (ocean extrapolation, SMB) and
the climate_realistic/snapshot behaviour."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.io.ncio import NCFile


T0 = 273.15


@pytest.fixture(scope="module")
def mesh():
    from ufemism2_tpu.mesh import build_uniform_mesh
    m = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 10e3)
    from ufemism2_tpu.mesh.projections import inverse_oblique_sg_projection
    m.proj = (0.0, -90.0, 71.0)
    m.lon, m.lat = inverse_oblique_sg_projection(m.V[:, 0], m.V[:, 1],
                                                 *m.proj)
    return m


@pytest.fixture(scope="module")
def md(mesh):
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    return build_mesh_data(mesh)


def _write_climate_snapshot(path, mesh, T_base=250.0):
    x = np.linspace(-60e3, 60e3, 25)
    y = np.linspace(-60e3, 60e3, 25)
    X, Y = np.meshgrid(x, y, indexing="ij")
    Hs = 1000.0 + 0.0 * X
    T2m = np.broadcast_to((T_base + np.arange(12) * 1.0)[:, None, None],
                          (12, 25, 25))
    Pr = np.full((12, 25, 25), 0.05)
    with NCFile(path, "w") as nc:
        nc.def_dim("x", 25)
        nc.def_var("x", ("x",))
        nc.put("x", x)
        nc.def_dim("y", 25)
        nc.def_var("y", ("y",))
        nc.put("y", y)
        nc.def_dim("month", 12)
        nc.def_var("month", ("month",))
        nc.put("month", np.arange(1.0, 13.0))
        nc.def_var("Hs", ("x", "y"))
        nc.put("Hs", Hs)
        nc.def_var("T2m", ("month", "x", "y"))
        nc.put("T2m", T2m)
        nc.def_var("Precip", ("month", "x", "y"))
        nc.put("Precip", Pr)


class _FakeState:
    def __init__(self, nV, Hs=1500.0, Hi=1000.0, Hb=500.0, SL=-1e5):
        self.Hs = jnp.full(nV, Hs)
        self.Hi = jnp.full(nV, Hi)
        self.Hb = jnp.full(nV, Hb)
        self.SL = jnp.full(nV, SL)
        self.Hib = self.Hb


def _cfg(tmp_path, mesh, **over):
    from ufemism2_tpu.config import load_config
    import inspect
    cfg = tmp_path / "t.cfg"
    lines = ["&CONFIG"]
    for k, v in over.items():
        if isinstance(v, str):
            lines.append(f"{k} = '{v}'")
        elif isinstance(v, bool):
            lines.append(f"{k} = .{'TRUE' if v else 'FALSE'}.")
        else:
            lines.append(f"{k} = {v}")
    lines.append("/")
    cfg.write_text("\n".join(lines))
    return load_config(str(cfg))


def test_climate_snapshot_lapse_rate(tmp_path, mesh, md):
    snap = str(tmp_path / "snap.nc")
    _write_climate_snapshot(snap, mesh)
    C = _cfg(tmp_path, mesh,
             choice_climate_model_ANT="realistic",
             choice_climate_model_realistic="snapshot",
             filename_climate_snapshot_ANT=snap,
             do_lapse_rate_corrections_ANT=True,
             lapse_rate_temp_ANT=0.008)
    from ufemism2_tpu.models.climate import make_run_climate
    run = make_run_climate(C, md, "ANT", mesh=mesh)
    s = _FakeState(md.nV, Hs=1500.0)   # 500 m above the snapshot surface
    out = run(0.0, s)
    # T = T_snap - |lapse|*dHs = T_snap - 4 K
    assert np.allclose(np.asarray(out["T2m"][:, 0]), 250.0 - 4.0, atol=0.2)
    # precipitation reduced by the inversion-layer CC factor
    assert (np.asarray(out["Precip"]) < 0.05).all()


def test_climate_transient_deltaT(tmp_path, mesh, md):
    snap = str(tmp_path / "snap.nc")
    _write_climate_snapshot(snap, mesh)
    dT_file = str(tmp_path / "dT.nc")
    with NCFile(dT_file, "w") as nc:
        nc.def_dim("time", 3)
        nc.def_var("time", ("time",))
        nc.put("time", np.array([0.0, 1000.0, 2000.0]))
        nc.def_var("dT", ("time",))
        nc.put("dT", np.array([0.0, -5.0, -10.0]))
    C = _cfg(tmp_path, mesh,
             choice_climate_model_ANT="snapshot_plus_transient_deltaT",
             filename_climate_snapshot_trans_dT_ANT=snap,
             filename_atmosphere_dT_ANT=dT_file)
    from ufemism2_tpu.models.climate import make_run_climate
    run = make_run_climate(C, md, "ANT", mesh=mesh)
    s = _FakeState(md.nV)
    T_at = lambda t: float(np.asarray(run(t, s)["T2m"]).mean())
    assert T_at(500.0) == pytest.approx(T_at(0.0) - 2.5, abs=0.01)
    # colder => drier through the CC correction
    P0 = float(np.asarray(run(0.0, s)["Precip"]).mean())
    P1 = float(np.asarray(run(1000.0, s)["Precip"]).mean())
    assert P1 < P0


def test_eismint1_formulas(md):
    """EISMINT1 moving margin: T = 270 - 0.01 Hs; fixed margin:
    T = 239 + 8e-8 d^3 (climate_idealised.f90:126-152)."""
    from ufemism2_tpu.models.climate import make_run_climate

    class C:
        choice_climate_model_ANT = "idealised"
        choice_climate_model_idealised = "EISMINT1_A"
    run = make_run_climate(C, md, "ANT")
    s = _FakeState(md.nV, Hs=2000.0)
    assert np.allclose(np.asarray(run(0.0, s)["T2m"]), 270.0 - 20.0)

    C.choice_climate_model_idealised = "EISMINT1_D"
    run = make_run_climate(C, md, "ANT")
    out = np.asarray(run(0.0, s)["T2m"][:, 0])
    V = np.asarray(md.V)
    d = np.maximum(np.abs(V[:, 0]), np.abs(V[:, 1])) / 1e3
    assert np.allclose(out, 239.0 + 8e-8 * d ** 3, atol=1e-6)


def test_ocean_extrapolation(mesh):
    from ufemism2_tpu.models.ocean import extrapolate_ocean_forcing
    nV = mesh.nV
    z = np.arange(0.0, 1501.0, 100.0)
    # shelf over the left half: draft at 300 m; bed at 1000 m
    left = mesh.V[:, 0] < 0
    Hi = np.where(left, 330.0, 0.0)     # draft ~ 292 m
    Hb = np.full(nV, -1000.0)
    SL = np.zeros(nV)
    d = np.tile(1.0 + 1e-3 * z, (nV, 1))
    # open ocean knows the profile; cavity (under shelf) is NaN
    d[left] = np.nan
    out = extrapolate_ocean_forcing(mesh, Hi, Hb, SL, z, d)
    assert np.isfinite(out).all()
    # cavity values at 500 m close to the offshore profile value
    k = np.argmin(np.abs(z - 500.0))
    assert np.abs(out[left, k] - 1.5).max() < 0.2


def test_imau_itm_firn_cycle(md):
    """IMAU-ITM: cold+snowy climate grows firn and yields positive SMB;
    warm climate melts and yields negative SMB."""
    from ufemism2_tpu.models.smb import imau_itm_step, imau_itm_params

    class C:
        SMB_IMAUITM_C_abl_constant_ANT = -49.0
        SMB_IMAUITM_C_abl_Ts_ANT = 10.0
        SMB_IMAUITM_C_abl_Q_ANT = 0.0227
        SMB_IMAUITM_C_refr_ANT = 0.051
        SMB_IMAUITM_albedo_ice = 0.5
        SMB_IMAUITM_albedo_snow = 0.85
        SMB_IMAUITM_albedo_soil = 0.2
        SMB_IMAUITM_albedo_water = 0.1
    p = imau_itm_params(C, "ANT")
    nV = md.nV
    masks = dict(mask_icefree_ocean=jnp.zeros(nV, bool),
                 mask_grounded_ice=jnp.ones(nV, bool),
                 mask_floating_ice=jnp.zeros(nV, bool))
    noice = jnp.zeros(nV, bool)
    firn = jnp.full((nV, 12), 1.0)
    melt0 = jnp.zeros(nV)

    T_cold = jnp.full((nV, 12), T0 - 30.0)
    Pr = jnp.full((nV, 12), 0.05)
    Q = jnp.full((nV, 12), 100.0)
    smb_c, aux_c = imau_itm_step(p, T_cold, Pr, Q, masks, noice, firn,
                                 melt0)
    assert float(np.asarray(smb_c).mean()) > 0
    assert float(np.asarray(aux_c["FirnDepth"]).mean()) > 1.0

    T_warm = jnp.full((nV, 12), T0 + 5.0)
    smb_w, aux_w = imau_itm_step(p, T_warm, Pr, Q, masks, noice, firn,
                                 melt0)
    assert float(np.asarray(smb_w).mean()) < 0
    # melting lowers albedo towards the ice value
    assert float(np.asarray(aux_w["Albedo"]).mean()) \
        < float(np.asarray(aux_c["Albedo"]).mean())


def test_insolation_static(tmp_path, mesh):
    ins_file = str(tmp_path / "ins.nc")
    lon = np.arange(0.0, 360.0, 30.0)
    lat = np.arange(-90.0, 91.0, 10.0)
    t = np.array([-2000.0, -1000.0, 0.0])
    Q = np.zeros((3, 12, len(lon), len(lat)))
    for k in range(3):
        Q[k] = 300.0 + k * 10.0 + np.zeros((12, len(lon), len(lat)))
    with NCFile(ins_file, "w") as nc:
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

    class C:
        choice_insolation_forcing = "realistic"
        filename_insolation = ins_file
        start_time_of_run = -1500.0
        end_time_of_run = 0.0
    from ufemism2_tpu.models.insolation import InsolationForcing
    ins = InsolationForcing(C, mesh)
    v = np.asarray(ins.at_time(-1500.0))
    assert v.shape == (mesh.nV, 12)
    assert np.allclose(v, 305.0, atol=0.5)   # halfway between 300 and 310
