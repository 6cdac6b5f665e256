"""ELRA GIA: load-anomaly formulation relative to the GIA-equilibrium
reference geometry (GIA_ELRA.f90 initialise_ELRA_reference_load) with a
TPU-compatible real FFT (no complex128)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config


@pytest.mark.slow
def test_elra_anomaly_and_rebound():
    from ufemism2_tpu.main.region import ModelRegion
    C = Config(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="Halfar",
        choice_refgeo_GIAeq_ANT="idealised",
        dx_refgeo_init_idealised=50e3,
        refgeo_idealised_Halfar_H0=3000.0,
        refgeo_idealised_Halfar_R0=500e3,
        uniform_Glens_flow_factor=1e-16,
        choice_ice_rheology_Glen="uniform",
        choice_stress_balance_approximation="SIA",
        choice_sliding_law="no_sliding",
        choice_GIA_model="ELRA", dt_GIA=10.0,
        xmin_ANT=-750e3, xmax_ANT=750e3, ymin_ANT=-750e3, ymax_ANT=750e3,
        maximum_resolution_uniform=150e3,
        maximum_resolution_grounded_ice=150e3,
        maximum_resolution_ice_front=100e3, ice_front_width=100e3,
        start_time_of_run=0.0, end_time_of_run=30.0,
        nit_Lloyds_algorithm=2, refgeo_Hi_min=2.0)
    r = ModelRegion(C, "ANT")
    # at the GIA-equilibrium geometry there is NO deformation
    dHb_dt0, _ = r.run_gia(0.0, r.state, 10.0)
    assert float(jnp.abs(dHb_dt0).max()) < 1e-6
    # full deglaciation: the bed rebounds under the former dome
    s2 = r.state.replace(Hi=r.state.Hi * 0, TAF=r.state.TAF * 0 - 1.0)
    dHb_dt1, _ = r.run_gia(0.0, s2, 10.0)
    centre = np.argmin(np.abs(r.mesh.V).sum(axis=1))
    assert float(dHb_dt1[centre]) > 0
    # and the coupled run steps with the GIA event live
    r.run_to(30.0)
    assert np.isfinite(np.asarray(r.state.dHb)).all()
