"""Hybrid DIVA/BPA stress balance (hybrid_DIVA_BPA_main.f90)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config
from ufemism2_tpu.core.mesh_data import build_mesh_data
from ufemism2_tpu.core.ice.state import init_ice_state
from ufemism2_tpu.core.analytical import halfar_H


def _setup(small_mesh):
    C = Config(choice_sliding_law="Weertman",
               choice_basal_hydrology_model="Martin2011",
               choice_ice_rheology_Glen="uniform",
               uniform_Glens_flow_factor=1e-16,
               visc_it_nit=30,
               choice_subgrid_grounded_fraction="bilin_interp_TAF")
    md = build_mesh_data(small_mesh)
    x, y = small_mesh.V[:, 0], small_mesh.V[:, 1]
    Hi = halfar_H(1e-16, 3.0, 2000.0, 45e3, x, y, 0.0)
    Hb = np.zeros_like(Hi)
    s = init_ice_state(md, Hi, Hb, np.zeros_like(Hi), nz=md.nz,
                       dt_init=0.1)
    return C, md, s


def test_hybrid_matches_pure_solvers(small_mesh):
    from ufemism2_tpu.core.ice.hybrid import make_solve_hybrid
    from ufemism2_tpu.core.ice.ssadiva import make_solve_ssa_diva
    C, md, s = _setup(small_mesh)
    nTri = small_mesh.nTri

    # all-DIVA hybrid reproduces the pure DIVA solution
    solve_h = make_solve_hybrid(C, md, np.zeros(nTri, bool))
    solve_d = make_solve_ssa_diva(C, md, "DIVA")
    uh, vh, u3h, v3h, _, _ = solve_h(md, s.Hi, s.Hs, s.Hb, s.SL, s.Ti, s)
    ud, vd, _, _, _, _, _ = solve_d(md, s.Hi, s.Hs, s.Hb, s.SL, s.Ti, s)
    assert np.isfinite(np.asarray(uh)).all()
    # an all-DIVA hybrid is algebraically the DIVA system: machine agreement
    scale = max(float(jnp.abs(ud).max()), 1e-6)
    assert float(jnp.abs(uh - ud).max()) / scale < 1e-10
    assert float(jnp.abs(vh - vd).max()) / scale < 1e-10
    # dome must actually flow for this test to mean anything
    assert float(jnp.abs(ud).max()) > 1.0


def test_hybrid_mixed_mask_runs(small_mesh):
    from ufemism2_tpu.core.ice.hybrid import make_solve_hybrid
    C, md, s = _setup(small_mesh)
    # BPA in the eastern half, DIVA in the west
    mask_BPA = small_mesh.Tricc[:, 0] > 0.0
    solve_h = make_solve_hybrid(C, md, mask_BPA)
    uh, vh, u3h, v3h, nvi, nai = solve_h(md, s.Hi, s.Hs, s.Hb, s.SL,
                                         s.Ti, s)
    assert np.isfinite(np.asarray(uh)).all()
    assert np.isfinite(np.asarray(u3h)).all()
    assert int(nai) > 0
    # flow is radially outward from the dome centre: u > 0 in the east,
    # < 0 in the west, on both sub-domains
    cc = small_mesh.Tricc
    east = (cc[:, 0] > 15e3) & (np.abs(cc[:, 1]) < 20e3)
    west = (cc[:, 0] < -15e3) & (np.abs(cc[:, 1]) < 20e3)
    uh_np = np.asarray(uh)
    assert uh_np[east].mean() > 0
    assert uh_np[west].mean() < 0
    # vertical structure on the BPA side: surface faster than base
    u3_np = np.asarray(u3h)
    fast = east & (np.abs(u3_np[:, 0]) > 0.5)
    assert (np.abs(u3_np[fast, 0]) >= np.abs(u3_np[fast, -1]) - 1e-6).all()


def test_roi_polygons():
    from ufemism2_tpu.mesh.roi_polygons import calc_roi_polygon, list_rois
    assert len(list_rois()) >= 25
    p = calc_roi_polygon("Pine_Island_Glacier")
    assert p.shape[1] == 2 and p.shape[0] > 10
    with pytest.raises(ValueError):
        calc_roi_polygon("Atlantis")
