"""Generic input layer: layout detection, indexing normalisation,
timeframe search, read-and-remap in all three layouts (xy / lonlat /
mesh), vertical remap for 3-D and ocean fields.

Mirrors the coverage of the reference's netcdf_input tests
(src/UPSY/validation/unit_tests ut_netcdf; read_and_remap_field_from_file.f90).
"""

import numpy as np
import pytest

from ufemism2_tpu.io.ncio import NCFile
from ufemism2_tpu.io import input_files as inp


def linear_field(x, y):
    return 2.0 + 3e-5 * x - 1.5e-5 * y


@pytest.fixture(scope="module")
def mesh():
    from ufemism2_tpu.mesh import build_uniform_mesh
    m = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 6e3)
    # attach lon/lat (ANT-style projection)
    from ufemism2_tpu.mesh.projections import inverse_oblique_sg_projection
    m.proj = (0.0, -90.0, 71.0)
    m.lon, m.lat = inverse_oblique_sg_projection(
        m.V[:, 0], m.V[:, 1], *m.proj)
    return m


def write_xy_file(path, yx_order=False, flip_y=False, with_time=True):
    x = np.linspace(-80e3, 80e3, 41)
    y = np.linspace(-80e3, 80e3, 37)
    X, Y = np.meshgrid(x, y, indexing="ij")
    F = linear_field(X, Y)
    F3 = np.stack([F + k for k in range(3)])          # 3 timeframes
    y_out = y[::-1] if flip_y else y
    Fw = F3[:, :, ::-1] if flip_y else F3
    if yx_order:
        Fw = np.swapaxes(Fw, 1, 2)
    with NCFile(path, "w") as nc:
        nc.def_dim("x", len(x))
        nc.def_dim("y", len(y))
        nc.def_var("x", ("x",))
        nc.put("x", x)
        nc.def_var("y", ("y",))
        nc.put("y", y_out)
        if with_time:
            nc.def_dim("time", 3)
            nc.def_var("time", ("time",))
            nc.put("time", np.array([0.0, 100.0, 200.0]))
            dims = ("time", "y", "x") if yx_order else ("time", "x", "y")
            nc.def_var("Hi", dims)
            nc.put("Hi", Fw)
        else:
            dims = ("y", "x") if yx_order else ("x", "y")
            nc.def_var("Hi", dims)
            nc.put("Hi", Fw[0])
    return x, y, F


def test_xy_2D_conservative(tmp_path, mesh):
    p = str(tmp_path / "xy.nc")
    write_xy_file(p)
    d = inp.read_field_from_file_2D(p, "Hi", mesh, time_to_read=100.0)
    # conservative remap yields exact cell averages for linear fields,
    # i.e. the field value at the Voronoi-cell centroid
    exact = linear_field(mesh.VorGC[:, 0], mesh.VorGC[:, 1]) + 1.0
    interior = mesh.VBI == 0
    assert np.abs(d[interior] - exact[interior]).max() < 1e-6


def test_xy_indexing_variants(tmp_path, mesh):
    """[y,x] storage order and flipped y axis are normalised away."""
    p1, p2 = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    write_xy_file(p1, yx_order=True)
    write_xy_file(p2, yx_order=True, flip_y=True)
    d1 = inp.read_field_from_file_2D(p1, "Hi", mesh, time_to_read=0.0)
    d2 = inp.read_field_from_file_2D(p2, "Hi", mesh, time_to_read=0.0)
    assert np.allclose(d1, d2)
    exact = linear_field(mesh.VorGC[:, 0], mesh.VorGC[:, 1])
    interior = mesh.VBI == 0
    assert np.abs(d1[interior] - exact[interior]).max() < 1e-6


def test_field_alias_resolution(tmp_path, mesh):
    """'thickness' resolves through the Hi alias list."""
    p = str(tmp_path / "alias.nc")
    x = np.linspace(-80e3, 80e3, 21)
    y = np.linspace(-80e3, 80e3, 21)
    X, Y = np.meshgrid(x, y, indexing="ij")
    with NCFile(p, "w") as nc:
        nc.def_dim("x", len(x))
        nc.def_var("x", ("x",))
        nc.put("x", x)
        nc.def_dim("y", len(y))
        nc.def_var("y", ("y",))
        nc.put("y", y)
        nc.def_var("thickness", ("x", "y"))
        nc.put("thickness", linear_field(X, Y))
    d = inp.read_field_from_file_2D(p, "Hi", mesh)
    assert np.isfinite(d).all()


def test_lonlat_2D(tmp_path, mesh):
    p = str(tmp_path / "ll.nc")
    lon = np.arange(0.0, 360.0, 5.0)
    lat = np.arange(-90.0, 90.1, 5.0)
    # smooth function of lon/lat
    LO, LA = np.meshgrid(lon, lat, indexing="ij")
    F = 240.0 + 0.5 * LA + 2.0 * np.cos(np.deg2rad(LO))
    with NCFile(p, "w") as nc:
        nc.def_dim("lon", len(lon))
        nc.def_var("lon", ("lon",))
        nc.put("lon", lon)
        nc.def_dim("lat", len(lat))
        nc.def_var("lat", ("lat",))
        nc.put("lat", lat)
        nc.def_var("T2m", ("lon", "lat"))
        nc.put("T2m", F)
    d = inp.read_field_from_file_2D(p, "T2m", mesh)
    exact = 240.0 + 0.5 * mesh.lat + 2.0 * np.cos(np.deg2rad(mesh.lon))
    assert np.abs(d - exact).max() < 0.05   # bilinear on a 5-deg grid


def test_mesh_to_mesh(tmp_path, mesh):
    """Field on a different mesh read + conservatively remapped."""
    from ufemism2_tpu.mesh import build_uniform_mesh
    src = build_uniform_mesh(-60e3, 60e3, -60e3, 60e3, 8e3)
    p = str(tmp_path / "mesh.nc")
    F = linear_field(src.V[:, 0], src.V[:, 1])
    with NCFile(p, "w") as nc:
        nc.def_dim("vi", src.nV)
        nc.def_dim("ti", src.nTri)
        nc.def_dim("two", 2)
        nc.def_dim("three", 3)
        nc.def_var("V", ("vi", "two"))
        nc.put("V", src.V)
        nc.def_var("Tri", ("ti", "three"), dtype="i8")
        nc.put("Tri", src.Tri)
        nc.def_var("Hi", ("vi",))
        nc.put("Hi", F)
    d = inp.read_field_from_file_2D(p, "Hi", mesh)
    exact = linear_field(mesh.VorGC[:, 0], mesh.VorGC[:, 1])
    interior = mesh.VBI == 0
    assert np.abs(d[interior] - exact[interior]).max() < 1e-6


def test_3D_zeta_remap(tmp_path, mesh):
    """3-D zeta field is read and vertically remapped to the model grid."""
    p = str(tmp_path / "z.nc")
    x = np.linspace(-80e3, 80e3, 25)
    y = np.linspace(-80e3, 80e3, 25)
    zeta_src = np.linspace(0.0, 1.0, 7)
    X, Y = np.meshgrid(x, y, indexing="ij")
    F = linear_field(X, Y)[None, :, :] + 10.0 * zeta_src[:, None, None]
    with NCFile(p, "w") as nc:
        nc.def_dim("x", len(x))
        nc.def_var("x", ("x",))
        nc.put("x", x)
        nc.def_dim("y", len(y))
        nc.def_var("y", ("y",))
        nc.put("y", y)
        nc.def_dim("zeta", 7)
        nc.def_var("zeta", ("zeta",))
        nc.put("zeta", zeta_src)
        nc.def_var("Ti", ("zeta", "x", "y"))
        nc.put("Ti", F)
    d = inp.read_field_from_file_3D(p, "Ti", mesh)
    assert d.shape == (mesh.nV, mesh.nz)
    interior = mesh.VBI == 0
    exact = (linear_field(mesh.VorGC[:, 0], mesh.VorGC[:, 1])[:, None]
             + 10.0 * mesh.zeta[None, :])
    err = np.abs(d - exact)[interior][:, 1:-1]
    assert err.max() < 1e-3


def test_3D_ocean_remap_and_masking(tmp_path, mesh):
    p = str(tmp_path / "oc.nc")
    x = np.linspace(-80e3, 80e3, 25)
    y = np.linspace(-80e3, 80e3, 25)
    depth = np.array([50.0, 150.0, 300.0, 600.0, 1200.0])
    X, Y = np.meshgrid(x, y, indexing="ij")
    T = (1.0 + 1e-3 * depth)[:, None, None] + 0 * X[None]
    with NCFile(p, "w") as nc:
        nc.def_dim("x", len(x))
        nc.def_var("x", ("x",))
        nc.put("x", x)
        nc.def_dim("y", len(y))
        nc.def_var("y", ("y",))
        nc.put("y", y)
        nc.def_dim("depth", 5)
        nc.def_var("depth", ("depth",))
        nc.put("depth", depth)
        nc.def_var("T_ocean", ("depth", "x", "y"))
        nc.put("T_ocean", T)
    z_ocean = np.arange(0.0, 1501.0, 100.0)
    d = inp.read_field_from_file_3D_ocean(p, "T_ocean", mesh, z_ocean)
    assert d.shape == (mesh.nV, len(z_ocean))
    # mid-column: linear profile reproduced
    k = np.argmin(np.abs(z_ocean - 300.0))
    assert np.abs(d[:, k] - 1.3).max() < 0.05


def test_series_0D(tmp_path):
    p = str(tmp_path / "series.nc")
    t = np.array([0.0, 1000.0, 2000.0])
    co2 = np.array([280.0, 400.0, 560.0])
    with NCFile(p, "w") as nc:
        nc.def_dim("time", 3)
        nc.def_var("time", ("time",))
        nc.put("time", t)
        nc.def_var("CO2", ("time",))
        nc.put("CO2", co2)
    assert inp.read_field_from_file_0D(p, "CO2", 500.0) == pytest.approx(340.0)
    tt, dd = inp.read_series_from_file(p, "CO2")
    assert np.allclose(dd, co2)


def test_geothermal_flux_from_file(tmp_path, mesh):
    """read_from_file geothermal heat flux: read 'hflux' [W m^-2] from a
    lon/lat file (Shapiro & Ritzwoller layout), remap to mesh, convert to
    J m^-2 yr^-1 (geothermal_heat_flux.f90:50-61)."""
    from ufemism2_tpu.config import Config
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    from ufemism2_tpu.core.ice.thermodynamics import make_geothermal_flux
    from ufemism2_tpu.utils.constants import sec_per_year

    lon = np.linspace(0.0, 359.0, 180)
    lat = np.linspace(-90.0, 90.0, 91)
    hflux = 0.05 + 0.01 * np.cos(np.deg2rad(lat))[None, :] \
        * np.ones((len(lon), 1))                       # [W m^-2]
    p = tmp_path / "ghf.nc"
    with NCFile(p, "w") as nc:
        nc.def_dim("lon", len(lon))
        nc.def_dim("lat", len(lat))
        nc.def_var("lon", ("lon",)); nc.put("lon", lon)
        nc.def_var("lat", ("lat",)); nc.put("lat", lat)
        nc.def_var("hflux", ("lon", "lat"))
        nc.put("hflux", hflux)

    C = Config(choice_geothermal_heat_flux="read_from_file",
               filename_geothermal_heat_flux=str(p))
    md = build_mesh_data(mesh)
    ghf = np.asarray(make_geothermal_flux(C, md))
    # mesh sits at the south pole (ANT projection): expect ~0.05 W/m2
    # (cos(lat) ~ 0 near -90) in yr units
    want = (0.05 + 0.01 * np.cos(np.deg2rad(mesh.lat))) * sec_per_year
    np.testing.assert_allclose(ghf, want, rtol=1e-3)
