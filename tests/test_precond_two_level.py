"""Two-level preconditioner (ssadiva.make_precond_two_level): additive
piecewise-constant coarse correction over Morton aggregates. Checks (a)
the preconditioned solve reproduces the 2x2 block-Jacobi solution, and
(b) the coarse Galerkin operator matches P^T A P built from the
matrix-free apply."""

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


def test_coarse_galerkin_matches_ptap():
    """A_c assembled from row weights == P^T A P with A applied to the
    coarse basis vectors (exact identity, up to fp roundoff)."""
    import jax
    from ufemism2_tpu.core.ice.ssadiva import (
        C2_BLOCK, make_A, make_precond_two_level)
    r = _small_region("two_level")
    md = r.md
    assert "c2_bcol" in md.extras
    nTri = md.nTri
    nB = (nTri + C2_BLOCK - 1) // C2_BLOCK
    rng = np.random.default_rng(0)
    dt = md.A.dtype
    N_b = jnp.asarray(1e13 * (1 + rng.random(nTri)), dt)
    dNx = jnp.asarray(1e7 * rng.standard_normal(nTri), dt)
    dNy = jnp.asarray(1e7 * rng.standard_normal(nTri), dt)
    beta = jnp.asarray(1e4 * rng.random(nTri), dt)

    A = make_A(md, N_b, dNx, dNy, beta)
    blk = np.asarray(md.x("c2_blk"))
    free = np.asarray(md.x("ssa_bc_free"))

    # dense P^T A P via applies on the coarse basis (masked to free rows)
    n2 = 2 * nB
    Ac_ref = np.zeros((n2, n2))
    for J in range(nB):
        for b in range(2):
            eu = jnp.asarray(((blk == J) & free).astype(np.float64), dt)
            z = jnp.zeros(nTri, dt)
            Au, Av = A((eu, z) if b == 0 else (z, eu))
            Au = np.asarray(Au) * free
            Av = np.asarray(Av) * free
            for I in range(nB):
                m = blk == I
                Ac_ref[2 * I, 2 * J + b] = Au[m].sum()
                Ac_ref[2 * I + 1, 2 * J + b] = Av[m].sum()
    # identity contributions for non-free rows (as the implementation)
    for I in range(nB):
        nf = float((~free[blk == I]).sum())
        Ac_ref[2 * I, 2 * I] += nf
        Ac_ref[2 * I + 1, 2 * I + 1] += nf

    # the implementation's A_c, recovered by applying the coarse-solve
    # part of the preconditioner to unit residuals is awkward; instead
    # re-run its assembly path directly
    from ufemism2_tpu.core.ice import ssadiva as mod
    import jax.scipy.linalg as jsl
    M = make_precond_two_level(md, N_b, dNx, dNy, beta)
    # M(r) = BJ(r) + P Ac^{-1} P^T r; recover Ac^{-1} action and compare
    # by checking M's coarse part inverts Ac_ref: pick rc = Ac_ref e_J,
    # inject it as a residual constant on aggregate J, and verify the
    # coarse component returned equals e_J (to solver precision).
    rng2 = np.random.default_rng(1)
    zc_true = rng2.standard_normal(n2)
    rc = Ac_ref @ zc_true
    ru = np.zeros(nTri)
    rv = np.zeros(nTri)
    # distribute coarse residual evenly over each aggregate's free rows
    for I in range(nB):
        m = (blk == I) & free
        if m.sum():
            ru[m] = rc[2 * I] / m.sum()
            rv[m] = rc[2 * I + 1] / m.sum()
    from ufemism2_tpu.core.ice.ssadiva import make_precond
    Mbj = make_precond(md, N_b, dNx, dNy, beta)
    zu, zv = M((jnp.asarray(ru, dt), jnp.asarray(rv, dt)))
    bu, bv = Mbj((jnp.asarray(ru, dt), jnp.asarray(rv, dt)))
    cu = np.asarray(zu) - np.asarray(bu)
    cv = np.asarray(zv) - np.asarray(bv)
    # coarse component is constant per aggregate = zc_true
    got = np.zeros(n2)
    for I in range(nB):
        m = (blk == I) & free
        if m.sum():
            got[2 * I] = cu[m].mean()
            got[2 * I + 1] = cv[m].mean()
        else:
            got[2 * I] = zc_true[2 * I]       # excluded aggregates
            got[2 * I + 1] = zc_true[2 * I + 1]
    rel = np.abs(got - zc_true).max() / max(np.abs(zc_true).max(), 1e-30)
    assert rel < 2e-3, rel


@pytest.mark.slow
def test_two_level_matches_block_jacobi_solution():
    r1 = _small_region("block_jacobi")
    s1 = r1.pc_step(r1.md, r1.state, jnp.asarray(1.0))
    r2 = _small_region("two_level")
    assert "c2_bcol" in r2.md.extras
    s2 = r2.pc_step(r2.md, r2.state, jnp.asarray(1.0))
    u1, u2 = np.asarray(s1.u_vav_b), np.asarray(s2.u_vav_b)
    rel = np.abs(u1 - u2).max() / max(np.abs(u1).max(), 1e-30)
    assert rel < 1e-4, rel
    assert int(s2.n_Axb_its) > 0
