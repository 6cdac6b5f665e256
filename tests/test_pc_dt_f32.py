"""f32 performance mode must not floor the pc dt controller.

Round-4 regression: the semi-implicit thickness solve ran at the f32
tolerance floor (~1e-5 relative residual = ~0.03 m of solution noise on
a 3000 m column), the pc controller read that as truncation error
tau >= pc_epsilon, and dt pinned at its noise equilibrium near
dt_ice_min (Halfar 40 km: 5000 steps vs the reference's 601 for 500 yr).
The thickness solve now runs in f64 regardless of the performance mode
(conservation_of_mass_semiimplicit.f90 solves in double at rtol 1e-8).
"""

import numpy as np
import jax.numpy as jnp


def _halfar_region(precision):
    from ufemism2_tpu.config import Config
    from ufemism2_tpu.main.region import ModelRegion
    C = Config(
        tpu_precision=precision,
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="Halfar",
        dx_refgeo_init_idealised=100e3,
        refgeo_idealised_Halfar_H0=3000.0,
        refgeo_idealised_Halfar_R0=500e3,
        uniform_Glens_flow_factor=1e-16,
        choice_ice_rheology_Glen="uniform",
        choice_stress_balance_approximation="SIA",
        choice_ice_integration_method="semi-implicit",
        choice_sliding_law="no_sliding",
        xmin_ANT=-800e3, xmax_ANT=800e3,
        ymin_ANT=-800e3, ymax_ANT=800e3,
        maximum_resolution_uniform=100e3,
        maximum_resolution_grounded_ice=100e3,
        maximum_resolution_ice_front=100e3,
        ice_front_width=100e3,
        nit_Lloyds_algorithm=2,
        refgeo_Hi_min=2.0,
        allow_mesh_updates=False,
        dt_ice_min=0.1, dt_ice_max=10.0,
        pc_epsilon=0.005,
        end_time_of_run=50.0,
        choice_SMB_model_ANT="uniform", uniform_SMB=0.0,
        choice_BMB_model_ANT="uniform", uniform_BMB=0.0,
        choice_basal_hydrology_model="Martin2011",
    )
    return ModelRegion(C, "ANT")


def test_f32_dt_grows_above_minimum():
    r = _halfar_region("f32")
    r.run_to(30.0)
    dt = float(r.state.pc.dt_np1)
    eta = float(r.state.pc.eta_np1)
    # pre-fix behaviour: dt == 0.1 forever with eta pinned at 0.95*eps
    assert dt > 0.3, (dt, eta, r.n_dt_ice)
    # the accepted-at-dt_min marker (0.95*eps) must not be the steady
    # state of a smooth SIA dome
    assert eta < 0.9 * 0.005, (dt, eta)


def test_f32_dt_tracks_f64_dt():
    r32 = _halfar_region("f32")
    r32.run_to(30.0)
    r64 = _halfar_region("f64")
    r64.run_to(30.0)
    # the controllers see the same (discretisation-level) truncation
    # error, so the step counts must be close
    n32, n64 = r32.n_dt_ice, r64.n_dt_ice
    assert n32 <= 1.5 * n64, (n32, n64)
