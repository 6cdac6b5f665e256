"""Idealised ocean profiles (ISOMIP / TANH / LINEAR / LINEAR_THERMOCLINE)
pinned against direct evaluations of the reference's formulas
(src/UFEMISM/ocean/ocean_idealised.f90:102-284)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config
from ufemism2_tpu.utils.constants import (freezing_lambda_1,
                                          freezing_lambda_2,
                                          seawater_density)


@pytest.fixture(scope="module")
def setup():
    from ufemism2_tpu.mesh import build_uniform_mesh
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    mesh = build_uniform_mesh(-50e3, 50e3, -50e3, 50e3, 25e3)
    md = build_mesh_data(mesh)
    return mesh, md


class _S:
    def __init__(self, nV):
        self.Hi = jnp.full(nV, 500.0)
        self.Hb = jnp.full(nV, -600.0)
        self.SL = jnp.zeros(nV)
        self.Hib = jnp.full(nV, -440.0)


def _profiles(C, md, mesh):
    from ufemism2_tpu.models.ocean import make_run_ocean
    run = make_run_ocean(C, md, "ANT", mesh=mesh)
    out = run(0.0, _S(mesh.nV))
    return np.asarray(out["T"][0]), np.asarray(out["S"][0]), \
        np.asarray(out["depths"])


def test_isomip_warm_matches_reference(setup):
    mesh, md = setup
    C = Config(choice_ocean_model_ANT="idealised",
               choice_ocean_model_idealised="ISOMIP",
               choice_ocean_isomip_scenario="WARM")
    T, S, z = _profiles(C, md, mesh)
    # ocean_idealised.f90:139-143: linear ramp over z1=720, NOT clipped
    np.testing.assert_allclose(T, -1.9 + (1.0 + 1.9) * z / 720.0,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(S, 33.8 + (34.7 - 33.8) * z / 720.0,
                               rtol=1e-6, atol=1e-6)


def test_isomip_cold_salinity_differs_from_warm(setup):
    mesh, md = setup
    C = Config(choice_ocean_model_ANT="idealised",
               choice_ocean_model_idealised="ISOMIP",
               choice_ocean_isomip_scenario="COLD")
    T, S, z = _profiles(C, md, mesh)
    # COLD: T1=-1.9 (isothermal), S1=34.55 (ocean_idealised.f90:134-136)
    np.testing.assert_allclose(T, np.full_like(z, -1.9), atol=1e-6)
    np.testing.assert_allclose(S, 33.8 + (34.55 - 33.8) * z / 720.0,
                               rtol=1e-6, atol=1e-6)


def test_tanh_profile_matches_reference(setup):
    mesh, md = setup
    C = Config(choice_ocean_model_ANT="idealised",
               choice_ocean_model_idealised="TANH",
               ocean_tanh_deep_temperature=1.0,
               ocean_tanh_thermocline_depth=300.0,
               ocean_tanh_thermocline_scale_depth=150.0)
    T, S, z = _profiles(C, md, mesh)
    S0 = 34.0
    Tsurf = freezing_lambda_1 * S0 + freezing_lambda_2
    T_ref = Tsurf + (1.0 - Tsurf) * (1 + np.tanh((z - 300.0) / 150.0)) / 2
    S_ref = (S0 + C.uniform_laddie_eos_linear_alpha * (T_ref - Tsurf)
             / C.uniform_laddie_eos_linear_beta
             + 0.01 * np.sqrt(z)
             / (C.uniform_laddie_eos_linear_beta * seawater_density))
    np.testing.assert_allclose(T, T_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(S, S_ref, rtol=1e-5, atol=1e-5)


def test_linear_profile_matches_reference(setup):
    mesh, md = setup
    C = Config(choice_ocean_model_ANT="idealised",
               choice_ocean_model_idealised="LINEAR",
               ocean_linear_deep_temperature=-2.3,
               ocean_linear_deep_salinity=34.8,
               ocean_linear_reference_depth=2000.0)
    T, S, z = _profiles(C, md, mesh)
    S0 = 34.5
    Tsurf = freezing_lambda_1 * S0 + freezing_lambda_2
    np.testing.assert_allclose(T, Tsurf + (-2.3 - Tsurf) * z / 2000.0,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(S, S0 + (34.8 - S0) * z / 2000.0,
                               rtol=1e-5, atol=1e-5)


def test_linear_thermocline_three_layers(setup):
    mesh, md = setup
    C = Config(choice_ocean_model_ANT="idealised",
               choice_ocean_model_idealised="LINEAR_THERMOCLINE",
               ocean_lin_therm_surf_temperature=-1.0,
               ocean_lin_therm_deep_temperature=1.2,
               ocean_lin_therm_surf_salinity=34.0,
               ocean_lin_therm_deep_salinity=34.7,
               ocean_lin_therm_thermocline_top=200.0,
               ocean_lin_therm_thermocline_bottom=600.0)
    T, S, z = _profiles(C, md, mesh)
    # surface layer / linear thermocline / deep layer
    # (ocean_idealised.f90:259-276)
    w = np.clip((z - 200.0) / 400.0, 0.0, 1.0)
    np.testing.assert_allclose(T, -1.0 + 2.2 * w, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(S, 34.0 + 0.7 * w, rtol=1e-5, atol=1e-5)
