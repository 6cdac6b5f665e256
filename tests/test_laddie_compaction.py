"""LADDIE active-set compaction (the reference's load-balancing
repartitioning, mesh_repartitioning.f90:31-101): the coupled BMB-laddie
path on the compacted shelf sub-mesh must reproduce the masked full-mesh
leg, since every evaluated row's operator stencil lies inside the
extracted shelf + 3 rings."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config


def _mismip_like_region():
    from ufemism2_tpu.main.region import ModelRegion
    C = Config(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="MISMIPplus",
        dx_refgeo_init_idealised=10e3,
        refgeo_idealised_MISMIPplus_Hi_init=500.0,
        choice_stress_balance_approximation="DIVA",
        choice_sliding_law="Weertman",
        choice_thermo_model="none",
        choice_ocean_model_ANT="idealised",
        choice_ocean_model_idealised="MISMIPplus_WARM",
        choice_BMB_model_ANT="laddie",
        xmin_ANT=0.0, xmax_ANT=800e3, ymin_ANT=-40e3, ymax_ANT=40e3,
        maximum_resolution_uniform=32e3,
        maximum_resolution_grounded_ice=32e3,
        maximum_resolution_grounding_line=16e3,
        maximum_resolution_ice_front=16e3,
        ice_front_width=16e3, grounding_line_width=16e3,
        nit_Lloyds_algorithm=2,
        refgeo_Hi_min=2.0,
        visc_it_nit=2, pc_nit_max=2,
        dt_laddie=360.0,
        time_duration_laddie=0.05,
        time_duration_laddie_init=0.05,
    )
    return ModelRegion(C, "ANT")


def test_compact_laddie_matches_full():
    from ufemism2_tpu.models.laddie import make_run_bmb_laddie
    from ufemism2_tpu.core.ice.masks import determine_masks
    from ufemism2_tpu.core.ice.subgrid import \
        calc_grounded_fractions_bilin_TAF

    r = _mismip_like_region()
    s = r.state
    masks = determine_masks(r.md, s.Hi, s.Hb, s.SL)
    assert bool(masks["mask_floating_ice"].any()), "no shelf in the setup"
    fg = calc_grounded_fractions_bilin_TAF(r.md, s.Hi, s.Hb, s.SL,
                                           masks["mask_floating_ice"])
    ocean = r.ocean

    C_full = r.C.replace(tpu_laddie_compaction=False)
    C_comp = r.C.replace(tpu_laddie_compaction=True)
    run_full = make_run_bmb_laddie(C_full, r.md, "ANT")
    run_comp = make_run_bmb_laddie(C_comp, r.md, "ANT")

    bmb_full = np.asarray(run_full(0.0, s, masks, fg, ocean=ocean))
    bmb_comp = np.asarray(run_comp(0.0, s, masks, fg, ocean=ocean))

    shelf = np.asarray(masks["mask_floating_ice"])
    assert np.abs(bmb_full[shelf]).max() > 0.0, "no melt computed"
    scale = max(np.abs(bmb_full).max(), 1e-12)
    np.testing.assert_allclose(bmb_comp, bmb_full, rtol=0,
                               atol=1e-10 * scale)

    # second coupling with the same shelf mask: cached compact mesh,
    # persistent plume state keeps evolving
    bmb_full2 = np.asarray(run_full(0.1, s, masks, fg, ocean=ocean))
    bmb_comp2 = np.asarray(run_comp(0.1, s, masks, fg, ocean=ocean))
    np.testing.assert_allclose(bmb_comp2, bmb_full2, rtol=0,
                               atol=1e-10 * scale)


def test_compact_rebuild_on_shelf_change():
    from ufemism2_tpu.models.laddie import build_compact_laddie_md

    r = _mismip_like_region()
    s = r.state
    from ufemism2_tpu.core.ice.masks import determine_masks
    masks = determine_masks(r.md, s.Hi, s.Hb, s.SL)
    shelf = np.asarray(masks["mask_floating_ice"])
    md_c, (Vk, nVr), (Tk, nTr), (Ek, nEr) = \
        build_compact_laddie_md(r.md, shelf)
    assert nVr < r.md.nV, "compaction did not shrink the vertex set"
    assert md_c.nV % 256 == 0 and md_c.nTri % 256 == 0
    # every shelf vertex and its full 2-ring is inside the compact set
    keep = np.zeros(r.md.nV, bool)
    keep[Vk[:nVr]] = True
    assert keep[shelf].all()
    C_tbl = np.asarray(r.mesh.C)
    ring1 = np.unique(C_tbl[shelf][C_tbl[shelf] >= 0])
    assert keep[ring1].all()
