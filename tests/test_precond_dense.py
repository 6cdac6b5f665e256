"""Dense block-Jacobi preconditioner (ssadiva.make_precond_dense):
batched 128x128 (u,v) block inversion. Checks the preconditioned solve
reproduces the 2x2 block-Jacobi solution on a small DIVA model."""

import numpy as np
import pytest

import jax.numpy as jnp


def _small_region(precond):
    from ufemism2_tpu.config import Config
    from ufemism2_tpu.main.region import ModelRegion
    C = Config(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="Halfar",
        dx_refgeo_init_idealised=150e3,
        refgeo_idealised_Halfar_H0=3000.0,
        refgeo_idealised_Halfar_R0=500e3,
        uniform_Glens_flow_factor=1e-16,
        choice_ice_rheology_Glen="uniform",
        choice_stress_balance_approximation="DIVA",
        choice_sliding_law="Weertman",
        choice_basal_hydrology_model="Martin2011",
        xmin_ANT=-600e3, xmax_ANT=600e3, ymin_ANT=-600e3, ymax_ANT=600e3,
        maximum_resolution_uniform=150e3,
        maximum_resolution_grounded_ice=150e3,
        maximum_resolution_ice_front=75e3, ice_front_width=75e3,
        nit_Lloyds_algorithm=2, refgeo_Hi_min=2.0,
        visc_it_nit=3, pc_nit_max=2,
        tpu_stress_balance_precond=precond)
    return ModelRegion(C, "ANT")


@pytest.mark.slow
def test_dense_block_jacobi_matches_2x2():
    r1 = _small_region("block_jacobi")
    s1 = r1.pc_step(r1.md, r1.state, jnp.asarray(1.0))
    r2 = _small_region("block_dense")
    assert "bjd_vals" in r2.md.extras
    s2 = r2.pc_step(r2.md, r2.state, jnp.asarray(1.0))
    u1, u2 = np.asarray(s1.u_vav_b), np.asarray(s2.u_vav_b)
    rel = np.abs(u1 - u2).max() / max(np.abs(u1).max(), 1e-30)
    # same linear systems solved to the same tolerance with different
    # preconditioners: solutions agree to solver tolerance
    assert rel < 1e-4, rel
    assert int(s2.n_Axb_its) > 0
