"""LADDIE plume-model tests: integrators (euler/fbrk3/lfra) + standalone
program (reference: src/LADDIE/laddie_integration.f90,
src/LADDIE/main/LADDIE_program.f90)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config
from ufemism2_tpu.core.mesh_data import build_mesh_data
from ufemism2_tpu.core.ice.masks import determine_masks
from ufemism2_tpu.core.ice.state import init_ice_state
from ufemism2_tpu.models.laddie import (laddie_masks, make_laddie_step,
                                        init_laddie_state, run_laddie_leg)
from ufemism2_tpu.models.ocean import make_run_ocean, ocean_depth_axis


def _shelf_setup(small_mesh, scheme):
    C = Config(choice_laddie_integration_scheme=scheme,
               dt_laddie=120.0,
               choice_ocean_model_ANT="idealised",
               choice_ocean_model_idealised="MISMIPplus_WARM")
    md = build_mesh_data(small_mesh)
    x = small_mesh.V[:, 0]
    # grounded on the west, floating shelf in the middle, open ocean east
    Hb = np.where(x < -20e3, 100.0, -600.0)
    Hi = np.where(x < 20e3, np.where(x < -20e3, 500.0, 300.0), 0.0)
    s = init_ice_state(md, Hi, Hb, np.zeros_like(Hi), nz=4, dt_init=0.1)
    masks = determine_masks(md, s.Hi, s.Hb, s.SL)
    lm = laddie_masks(md, masks)
    ocean = make_run_ocean(C, md, "ANT")(0.0, s)
    forcing = {
        "Hib": s.Hib,
        "dHib_dx_b": md.M_ddx_a_b @ s.Hib,
        "dHib_dy_b": md.M_ddy_a_b @ s.Hib,
        "Ti_base": s.Ti[:, 0],
        "use_Ti": jnp.asarray(False),
        "z_ocean": jnp.asarray(ocean_depth_axis(C), md.A.dtype),
        "T_ocean": ocean["T"], "S_ocean": ocean["S"],
    }
    return C, md, lm, forcing


@pytest.mark.parametrize("scheme", ["euler", "fbrk3", "lfra"])
def test_laddie_integrators_stable(small_mesh, scheme):
    C, md, lm, forcing = _shelf_setup(small_mesh, scheme)
    assert bool(np.asarray(lm.a).any()), "setup must have a shelf"
    lst = init_laddie_state(C, md, lm, forcing)
    lst, melt = run_laddie_leg(C, md, lst, lm, forcing,
                               duration_days=0.25)
    H = np.asarray(lst.H)
    a = np.asarray(lm.a)
    assert np.isfinite(H).all() and np.isfinite(np.asarray(melt)).all()
    assert (H[a] >= C.laddie_thickness_minimum - 1e-6).all()
    # warm ISOMIP+ forcing over a 300 m draft must produce net melt
    assert float(np.asarray(melt)[a].mean()) > 0.0


def test_laddie_standalone_program(tmp_path):
    from ufemism2_tpu.main.laddie_program import run_laddie_standalone
    cfg = tmp_path / "laddie_test.cfg"
    cfg.write_text("""&CONFIG
  choice_refgeo_init_ANT = 'idealised'
  choice_refgeo_PD_ANT = 'idealised'
  choice_refgeo_PD_idealised = 'MISMIPplus'
  choice_refgeo_init_idealised = 'MISMIPplus'
  refgeo_idealised_MISMIPplus_Hi_init = 100.0
  xmin_ANT = 0.0
  xmax_ANT = 800e3
  ymin_ANT = -40e3
  ymax_ANT = 40e3
  maximum_resolution_uniform = 40e3
  nit_Lloyds_algorithm = 1
  choice_ocean_model_ANT = 'idealised'
  choice_ocean_model_idealised = 'MISMIPplus_WARM'
  dt_laddie = 360.0
  time_duration_laddie_init = 0.25
  dt_output = 1000.0
/
""")
    lst, melt = run_laddie_standalone(str(cfg), str(tmp_path / "out"))
    assert np.isfinite(np.asarray(lst.H)).all()
    # the warm forcing over a real shelf must melt
    assert float(np.asarray(melt).max()) > 0.0
    out_nc = tmp_path / "out" / "laddie_output_fields_mesh.nc"
    assert out_nc.exists()


def test_laddie_SGD_idealised(small_mesh):
    """SGD (laddie_physics.f90:330-386, masks_mod.f90:534): the flux is
    spread over floating-GL vertices in the channel band, integrates to
    laddie_SGD_flux, freshens/thickens the layer, and respects the
    start-time gate."""
    from ufemism2_tpu.models.laddie import make_calc_SGD
    from ufemism2_tpu.core.ice.masks import determine_masks

    C, md, lm, forcing = _shelf_setup(small_mesh, "fbrk3")
    C = Config(**{**C.as_dict(), "choice_laddie_SGD": "idealised",
                  "choice_laddie_SGD_idealised": "MISMIPplus_PC",
                  "laddie_SGD_flux": 72.0,
                  "start_time_of_applying_SGD": -1e9})
    x = small_mesh.V[:, 0]
    Hb = np.where(x < -20e3, 100.0, -600.0)
    Hi = np.where(x < 20e3, np.where(x < -20e3, 500.0, 300.0), 0.0)
    s = init_ice_state(md, Hi, Hb, np.zeros_like(Hi), nz=4, dt_init=0.1)
    masks = determine_masks(md, s.Hi, s.Hb, s.SL)

    calc = make_calc_SGD(C, md)
    sgd = np.asarray(calc(masks["mask_floating_ice"],
                          masks["mask_gl_fl"], 0.0))
    assert (sgd >= 0).all() and sgd.any()
    # total volume flux equals the configured flux
    np.testing.assert_allclose((sgd * np.asarray(small_mesh.A)).sum(),
                               72.0, rtol=1e-12)
    # only on floating-GL vertices inside the 5 km channel band
    on = sgd > 0
    assert (np.abs(small_mesh.V[on, 1]) < 2500.0).all()
    assert np.asarray(masks["mask_gl_fl"])[on].all()
    # time gate
    sgd_off = np.asarray(calc(masks["mask_floating_ice"],
                              masks["mask_gl_fl"], -2e9))
    assert not sgd_off.any()

    # the source enters the tracer equations: SGD water is fresh (S=0)
    # and at the local freezing point, so the layer freshens at the
    # injection vertices. (H itself stays pinned at the minimum-
    # thickness floor there - entr_dmin compensates volume sources
    # exactly, the reference's own feedback - so thickness is not a
    # usable signal at the GL.)
    forcing_sgd = dict(forcing, SGD=jnp.asarray(sgd))
    lst0 = init_laddie_state(C, md, lm, forcing)
    l_no, _ = run_laddie_leg(C, md, lst0, lm, forcing, duration_days=0.1)
    l_yes, _ = run_laddie_leg(C, md, lst0, lm, forcing_sgd,
                              duration_days=0.1)
    dS = np.asarray(l_yes.S - l_no.S)
    assert dS[on].mean() < 0
    dH = np.asarray(l_yes.H - l_no.H)
    assert np.isfinite(dH).all()
