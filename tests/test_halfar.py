"""Integrated test: Halfar dome SIA evolution vs analytic solution.

Coarse/fast version of the reference's it_ideal_Hlf_dome integrated tests;
the full-resolution runs live in the benchmark/validation scripts.
"""

import numpy as np
import pytest

from ufemism2_tpu.config import Config
from ufemism2_tpu.core.analytical import halfar_H, halfar_dHdt, bueler_dome


def test_halfar_solution_basics():
    A, n, H0, R0 = 1e-16, 3.0, 3000.0, 500e3
    assert halfar_H(A, n, H0, R0, 0.0, 0.0, 0.0) == H0
    assert halfar_H(A, n, H0, R0, 600e3, 0.0, 0.0) == 0.0
    # dome thins at the centre over time
    assert halfar_H(A, n, H0, R0, 0.0, 0.0, 100.0) < H0
    assert halfar_dHdt(A, n, H0, R0, 0.0, 0.0, 10.0) < 0


def test_bueler_solution():
    A, n, H0, R0, lam = 1e-16, 3.0, 3000.0, 500e3, 5.0
    H, M = bueler_dome(A, n, H0, R0, lam, 0.0, 0.0, 10.0)
    assert H > 0 and np.isfinite(M)


@pytest.mark.slow
def test_halfar_dome_integrated():
    import jax
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
        xmin_ANT=-750e3, xmax_ANT=750e3, ymin_ANT=-750e3, ymax_ANT=750e3,
        maximum_resolution_uniform=100e3,
        maximum_resolution_grounded_ice=100e3,
        maximum_resolution_ice_front=50e3,
        ice_front_width=50e3,
        start_time_of_run=0.0, end_time_of_run=200.0,
        nit_Lloyds_algorithm=2,
        refgeo_Hi_min=2.0,
    )
    r = ModelRegion(C, "ANT")
    s = r.run_to(200.0)
    Hi = np.asarray(s.Hi)
    Hex = halfar_H(1e-16, 3.0, 3000.0, 500e3,
                   r.mesh.V[:, 0], r.mesh.V[:, 1], 200.0)
    rmse = np.sqrt(((Hi - Hex) ** 2).mean())
    # coarse 50-100 km mesh: expect O(50 m) accuracy (reference gets
    # 34.9 m at 40 km)
    assert rmse < 80.0, rmse
    assert r.n_dt_ice > 10
