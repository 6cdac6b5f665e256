"""f32 (tpu performance mode) regression: a mesh update must not leak
f64 arrays into the state (the scipy remap operators produce f64; an
uncast override crashed the MISMIP benchmark's first post-update step
with a while_loop carry dtype mismatch)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config


@pytest.mark.slow
def test_f32_state_survives_mesh_update():
    from ufemism2_tpu.main.region import ModelRegion
    C = Config(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="Halfar",
        dx_refgeo_init_idealised=50e3,
        refgeo_idealised_Halfar_H0=3000.0,
        refgeo_idealised_Halfar_R0=500e3,
        uniform_Glens_flow_factor=1e-16,
        choice_ice_rheology_Glen="uniform",
        choice_stress_balance_approximation="SIA",
        choice_sliding_law="no_sliding",
        choice_thermo_model="3D_heat_equation",
        xmin_ANT=-750e3, xmax_ANT=750e3, ymin_ANT=-750e3, ymax_ANT=750e3,
        maximum_resolution_uniform=150e3,
        maximum_resolution_grounded_ice=150e3,
        maximum_resolution_ice_front=100e3, ice_front_width=100e3,
        start_time_of_run=0.0, end_time_of_run=30.0,
        nit_Lloyds_algorithm=2, refgeo_Hi_min=2.0,
        tpu_precision="f32")
    r = ModelRegion(C, "ANT")
    r.run_to(10.0)
    r.update_mesh()
    leaks = [f.name for f in dataclasses.fields(r.state)
             if not dataclasses.is_dataclass(getattr(r.state, f.name))
             and getattr(r.state, f.name).dtype == jnp.float64
             # model-time bookkeeping is f64 by design
             and f.name not in ("t_Hi_prev", "t_Hi_next", "dt_ice")]
    assert leaks == [], f"f64 leaks after mesh update: {leaks}"
    r.run_to(20.0)     # the post-update step must re-trace cleanly
    assert np.isfinite(np.asarray(r.state.Hi)).all()
