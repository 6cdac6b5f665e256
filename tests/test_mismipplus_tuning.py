"""MISMIP+ flow-factor tuning: the glen_A_scale extras slot must be
dynamic (no re-jit) and must actually change the stress-balance solution
(inversion_utilities.f90 MISMIPplus_adapt_flow_factor via
UFEMISM_program.f90:114-123)."""

import numpy as np
import pytest

import jax.numpy as jnp

CFG = ("/root/reference/automated_testing/integrated_tests/idealised/"
       "MISMIPplus/config_01_5km_spinup_part0.cfg")


@pytest.fixture(scope="module")
def region():
    from ufemism2_tpu.config import load_config
    from ufemism2_tpu.main.region import ModelRegion
    C = load_config(CFG, refgeo_idealised_MISMIPplus_Hi_init=500.0,
                    maximum_resolution_grounding_line=32e3,
                    maximum_resolution_grounded_ice=64e3,
                    maximum_resolution_uniform=128e3,
                    visc_it_nit=2, allow_mesh_updates=False)
    return ModelRegion(C, "ANT")


def test_glen_A_scale_slot_registered(region):
    assert "glen_A_scale" in region.md.extras
    assert float(np.asarray(region.md.extras["glen_A_scale"].arr)) == 1.0


def test_dynamic_flow_factor_changes_velocity(region):
    s1 = region.pc_step(region.md, region.state, jnp.asarray(1.0))
    u1 = float(np.abs(np.asarray(s1.u_vav_b)).max())
    e = region.md.extras["glen_A_scale"]
    old = e.arr
    try:
        e.arr = e.arr * 8.0
        s2 = region.pc_step(region.md, region.state, jnp.asarray(1.0))
        u2 = float(np.abs(np.asarray(s2.u_vav_b)).max())
    finally:
        e.arr = old
    # softer ice must flow measurably faster, with NO retrace (same
    # pytree structure - only the leaf value changed)
    assert u2 > 1.2 * u1, (u1, u2)


def test_adapt_flow_factor_updates_scale(region):
    from ufemism2_tpu.main.program import mismipplus_adapt_flow_factor
    e = region.md.extras["glen_A_scale"]
    old = e.arr
    try:
        C2 = mismipplus_adapt_flow_factor(region.C, region)
        # a GL exists (500 m slab grounds on the upward bed), so the
        # tuning must have moved the scale off 1.0 unless the GL sits
        # exactly at 450 km
        scale = float(np.asarray(e.arr))
        assert scale > 0.0
        assert C2.uniform_Glens_flow_factor == \
            region.C.uniform_Glens_flow_factor
    finally:
        e.arr = old


def test_mismipplus_bmb_melt_formula():
    """Cornford et al. (2020) Eq. 7 (BMB_idealised.f90:57-92)."""
    from ufemism2_tpu.config import Config
    from ufemism2_tpu.models.bmb import make_run_bmb

    class MD:
        nV = 4
        A = jnp.zeros(4, jnp.float64)

    class S:
        pass

    C = Config(choice_BMB_model_ANT="idealised",
               choice_BMB_model_idealised="MISMIP+",
               do_subgrid_BMB_at_grounding_line=True,
               choice_BMB_subgrid="FCMP")
    run = make_run_bmb(C, MD(), "ANT")
    s = S()
    s.Hib = jnp.asarray([-300.0, -50.0, -300.0, -700.0])
    s.Hb = jnp.asarray([-700.0, -700.0, -300.0, -700.0])
    masks = {"mask_floating_ice": jnp.asarray([True, True, True, True]),
             "mask_gl_gr": jnp.zeros(4, bool),
             "mask_grounded_ice": jnp.zeros(4, bool)}
    bmb = np.asarray(run(0.0, s, masks, jnp.zeros(4)))
    # melt = -0.2*tanh(cavity/75)*max(-100-zd, 0)
    assert np.isclose(bmb[0], -0.2 * np.tanh(400 / 75.0) * 200.0)
    assert bmb[1] == 0.0          # above z0=-100: no melt
    assert bmb[2] == 0.0          # zero cavity: tanh(0)
    assert np.isclose(bmb[3], 0.0)  # grounded draft==bed: zero cavity


def test_adapt_controller_damps_on_sign_flip(region):
    """The damped controller: full reference gain while the GL error
    keeps its sign, gain halved on every sign flip (the raw 2x-per-
    adaptation proportional controller oscillates the GL +-100 km on
    this discretisation; the fixed point is gain-independent)."""
    from ufemism2_tpu.main.program import mismipplus_adapt_flow_factor
    from ufemism2_tpu.core.ice.geometry import thickness_above_flotation

    region._mismip_tune = None
    scale0 = float(np.asarray(region.md.extras["glen_A_scale"].arr))

    def force_gl(x_gl):
        # synthetic TAF crossing zero at x = x_gl along y=0
        taf = jnp.asarray(x_gl - region.mesh.V[:, 0],
                          region.state.TAF.dtype)
        region.state = region.state.replace(TAF=taf)

    force_gl(530e3)                     # err +80 km
    mismipplus_adapt_flow_factor(region.C, region)
    t = region._mismip_tune
    assert t["gain"] == 1.0 and t["last_err"] > 0
    f1 = float(np.asarray(region.md.extras["glen_A_scale"].arr)) / scale0
    assert np.isclose(f1, 2.0 ** (80e3 / 80e3), rtol=0.02)

    force_gl(410e3)                     # err -40 km: sign flip
    mismipplus_adapt_flow_factor(region.C, region)
    assert region._mismip_tune["gain"] == 0.5
    force_gl(420e3)                     # same sign: gain restores slowly
    mismipplus_adapt_flow_factor(region.C, region)
    assert np.isclose(region._mismip_tune["gain"], 0.55)
    # restore the fixture's scale for other tests
    region.md.extras["glen_A_scale"].arr = jnp.asarray(
        scale0, region.md.extras["glen_A_scale"].arr.dtype)
    region._mismip_tune = None
