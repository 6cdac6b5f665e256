"""Salle2025 (Bueler & Van Pelt 2015) transient basal hydrology: bounds,
steady-state behaviour, and coupling into the sliding law."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def setup():
    from ufemism2_tpu.mesh import build_uniform_mesh
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    from ufemism2_tpu.core.analytical import halfar_H
    mesh = build_uniform_mesh(-500e3, 500e3, -500e3, 500e3, 50e3)
    md = build_mesh_data(mesh)
    Hi = jnp.asarray(halfar_H(1e-16, 3.0, 3000.0, 400e3,
                              mesh.V[:, 0], mesh.V[:, 1], 0.0))
    Hb = jnp.zeros(mesh.nV)
    grounded = Hi > 0.1
    return mesh, md, Hi, Hb, grounded


def test_salle2025_leg_bounds(setup):
    from ufemism2_tpu.core.ice.hydrology_salle2025 import (
        init_salle2025_state, run_salle2025_leg, W_MAX_TIL)
    from ufemism2_tpu.config import Config
    from ufemism2_tpu.utils.constants import ice_density, grav

    mesh, md, Hi, Hb, grounded = setup
    C = Config(basal_hydro_equil_time=0.5)
    h0 = init_salle2025_state(md)
    # sliding everywhere: 50 m/yr radially outward
    u = jnp.full(mesh.nV, 50.0)
    v = jnp.zeros(mesh.nV)
    h, N_til, tau_c = run_salle2025_leg(C, md, h0, Hi, Hb, grounded, u, v)

    W = np.asarray(h.W)
    W_til = np.asarray(h.W_til)
    P = np.asarray(h.P)
    P_o = np.asarray(ice_density * grav * Hi)
    assert np.isfinite(W).all() and np.isfinite(P).all()
    assert (W >= 0).all()
    assert (W_til >= 0).all() and (W_til <= W_MAX_TIL + 1e-12).all()
    assert (P <= P_o + 1e-6).all() and (P >= 0).all()
    # basal melt feeds the till: under grounded ice the till holds water
    assert W_til[np.asarray(grounded)].max() > 0
    # no water outside grounded ice
    assert np.abs(W[~np.asarray(grounded)]).max() == 0.0
    # till effective pressure bounded by overburden, yield stress >= 0
    # wherever there is no water layer correction
    N = np.asarray(N_til)
    g = np.asarray(grounded)
    assert (N[g] <= P_o[g] + 1e-6).all()
    assert np.isfinite(np.asarray(tau_c)).all()


def test_salle2025_till_fills_and_saturates(setup):
    """Longer leg: till water approaches its 2 m cap under sustained melt;
    effective pressure drops as the till saturates (the Bueler & Van Pelt
    mechanism that weakens the bed)."""
    from ufemism2_tpu.core.ice.hydrology_salle2025 import (
        init_salle2025_state, run_salle2025_leg, salle2025_till_outputs)
    from ufemism2_tpu.config import Config

    mesh, md, Hi, Hb, grounded = setup
    h0 = init_salle2025_state(md)
    u = jnp.full(mesh.nV, 50.0)
    v = jnp.zeros(mesh.nV)
    C_short = Config(basal_hydro_equil_time=0.2)
    C_long = Config(basal_hydro_equil_time=5.0)
    h_s, N_s, _ = run_salle2025_leg(C_short, md, h0, Hi, Hb, grounded,
                                    u, v, max_substeps=400)
    h_l, N_l, _ = run_salle2025_leg(C_long, md, h0, Hi, Hb, grounded,
                                    u, v, max_substeps=4000)
    g = np.asarray(grounded)
    assert float(np.asarray(h_l.W_til)[g].mean()) \
        > float(np.asarray(h_s.W_til)[g].mean())
    assert float(np.asarray(N_l)[g].mean()) \
        < float(np.asarray(N_s)[g].mean())


def test_salle2025_sliding_coupling(setup):
    """The hydro_N_eff extras slot (consumed by the sliding law when
    choice_basal_hydrology_model='Salle2025') registers and reads back."""
    from ufemism2_tpu.core.mesh_data import EField

    mesh, md, Hi, Hb, grounded = setup
    md.extras["hydro_N_eff"] = EField(jnp.full(mesh.nV, 1e5), "V")
    assert np.allclose(np.asarray(md.x("hydro_N_eff")), 1e5)
    # updating the value in place keeps the pytree structure
    md.extras["hydro_N_eff"].arr = jnp.full(mesh.nV, 2e5)
    assert np.allclose(np.asarray(md.x("hydro_N_eff")), 2e5)
