"""Mesh update must migrate ALL stateful components, not just the ice
state: bed-roughness nudging state, Salle2025 transient hydrology (and
its md.extras effective-pressure slot), and the Lagrangian tracer
machinery. The reference remaps every component on mesh update
(UFEMISM_main_model.f90:1311-1335, basal_hydrology_new.f90:1449-1491).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config


def _config(**over):
    base = dict(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="Halfar",
        dx_refgeo_init_idealised=50e3,
        refgeo_idealised_Halfar_H0=3000.0,
        refgeo_idealised_Halfar_R0=500e3,
        uniform_Glens_flow_factor=1e-16,
        choice_ice_rheology_Glen="uniform",
        choice_stress_balance_approximation="SIA",
        choice_sliding_law="Budd",
        choice_basal_hydrology_model="Salle2025",
        dt_basal_hydro=5.0,
        choice_tracer_tracking_model="particles",
        tractrackpart_dt_coupling=5.0,
        do_bed_roughness_nudging=True,
        choice_bed_roughness_nudging_method="H_dHdt_local",
        bed_roughness_nudging_dt=5.0,
        bed_roughness_nudging_t_start=0.0,
        bed_roughness_nudging_t_end=1e9,
        xmin_ANT=-750e3, xmax_ANT=750e3, ymin_ANT=-750e3, ymax_ANT=750e3,
        maximum_resolution_uniform=150e3,
        maximum_resolution_grounded_ice=150e3,
        maximum_resolution_ice_front=100e3, ice_front_width=100e3,
        start_time_of_run=0.0, end_time_of_run=40.0,
        nit_Lloyds_algorithm=2, refgeo_Hi_min=2.0,
        tpu_precision="f32")
    base.update(over)
    return Config(**base)


@pytest.mark.slow
def test_stateful_components_survive_mesh_update():
    from ufemism2_tpu.main.region import ModelRegion
    r = ModelRegion(_config(), "ANT")
    r.run_to(12.0)

    # perturb the carried states so the transfer is observable
    nV_old = r.mesh.nV
    r.hydro_state = r.hydro_state.replace(
        W_til=jnp.full(nV_old, 1.5, r.md.A.dtype))
    assert bool(r.tracer_state.alive.any()), "no live tracers before update"
    n_alive_before = int(r.tracer_state.alive.sum())
    br_mean_before = float(r.bed_roughness_state.generic.mean())

    r.update_mesh()
    nV_new = r.mesh.nV

    # hydrology state lives on the new mesh and kept its till water
    assert r.hydro_state.W_til.shape == (nV_new,)
    assert abs(float(r.hydro_state.W_til.mean()) - 1.5) < 0.2
    # the effective-pressure extras slot exists on the NEW md
    assert "hydro_N_eff" in r.md.extras
    assert r.md.extras["hydro_N_eff"].arr.shape == (nV_new,)

    # nudging state re-pointed at the remapped parameter
    assert r.bed_roughness_state.generic.shape == (nV_new,)
    assert np.isfinite(br_mean_before)
    assert abs(float(r.bed_roughness_state.generic.mean())
               - br_mean_before) < 0.5 * abs(br_mean_before) + 1e-6

    # tracers carried over (physical coordinates are mesh-independent)
    assert int(r.tracer_state.alive.sum()) == n_alive_before

    # ... and every stateful event path must run cleanly on the new mesh
    r.run_to(30.0)
    assert np.isfinite(np.asarray(r.state.Hi)).all()
    assert np.isfinite(np.asarray(r.hydro_state.W_til)).all()


@pytest.mark.slow
def test_imau_itm_smb_state_carries_across_mesh_update():
    from ufemism2_tpu.models.smb import ImauItmSMB

    class _MD:
        pass

    # carry_state_from is a pure remap of the three carried fields; test
    # it against a synthetic trilinear map without a full region run
    old = ImauItmSMB.__new__(ImauItmSMB)
    old.FirnDepth = jnp.ones((10, 12)) * 3.0
    old.MeltPreviousYear = jnp.arange(10.0)
    old.Albedo = jnp.full((10, 12), 0.8)

    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    M = sp.random(7, 10, density=0.4, random_state=rng, format="csr")
    M = sp.diags(1.0 / np.maximum(M.sum(axis=1).A.ravel(), 1e-12)) @ M

    new = ImauItmSMB.__new__(ImauItmSMB)
    remap = lambda a: jnp.asarray(M @ np.asarray(a), dtype=a.dtype)
    new.carry_state_from(old, remap)
    assert new.FirnDepth.shape == (7, 12)
    np.testing.assert_allclose(np.asarray(new.FirnDepth), 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new.Albedo), 0.8, rtol=1e-6)
