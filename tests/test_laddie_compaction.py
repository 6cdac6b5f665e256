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


def test_laddie_coupled_dist_matches_single_device():
    """The distributed composition: sharded PC stepping consumes a
    BMB field produced by the (replicated, compacted) LADDIE leg at
    coupling cadence (the multinode scope of unit_tests_multinode.f90,
    extended to a coupled component model).

    Parity statement (two tiers, like the reference's MPI runs):
    - ONE pc step matches single-device to machine precision, front
      BC rows included;
    - the multistep trajectory is solver-tolerance-reproducible ONLY:
      GMRES iterates on different partitions differ within rtol, and
      margin-advance thresholds amplify that into O(Hi) pointwise
      differences at individual front vertices (same behaviour as
      PETSc under MPI reduction reordering), so the trajectory is
      compared on integral quantities + step counts.
    """
    import jax
    from ufemism2_tpu.main.region import ModelRegion
    from ufemism2_tpu.parallel.dist import ShardedModel

    r1 = _mismip_like_region()

    # tier 1: single-step machine parity on the shelf geometry
    s1 = r1.pc_step(r1.md, r1.state, jnp.asarray(1.0))
    jax.block_until_ready(s1.Hi_next)
    SM = ShardedModel(r1.C, r1, 8)
    s2 = SM.from_dist(SM.step(SM.to_dist(r1.state), 1.0))
    for name in ("Hi_next", "u_vav_b", "divQ"):
        a = np.asarray(getattr(s1, name))
        b = np.asarray(getattr(s2, name))
        sc = max(float(np.max(np.abs(a))), 1e-30)
        assert float(np.max(np.abs(a - b))) / sc < 1e-12, name

    # tier 2: coupled trajectory, integral agreement
    r1.run_to(1.0)
    C2 = r1.C.replace(tpu_n_devices=8)
    r2 = ModelRegion(C2, "ANT", mesh=r1.mesh)
    assert r2._dist is not None, "distributed path not engaged"
    r2.run_to(1.0)

    assert r1.n_dt_ice == r2.n_dt_ice
    bmb1, bmb2 = np.asarray(r1.BMB), np.asarray(r2.BMB)
    assert np.isfinite(bmb2).all()
    assert float(np.abs(bmb1).max()) > 0.0, "laddie produced zero melt"
    np.testing.assert_allclose(bmb2, bmb1, rtol=1e-8, atol=1e-10)
    A = np.asarray(r1.mesh.A)
    for r in (r1, r2):
        assert np.isfinite(np.asarray(r.state.Hi)).all()
        assert (np.asarray(r.state.Hi) >= 0).all()
    vol1 = float((np.asarray(r1.state.Hi) * A).sum())
    vol2 = float((np.asarray(r2.state.Hi) * A).sum())
    assert abs(vol1 - vol2) / vol1 < 1e-3, (vol1, vol2)
