"""Physics-component unit tests: masks, subgrid, sliding, thermo pieces."""

import numpy as np
import jax.numpy as jnp
import pytest

from ufemism2_tpu.config import Config
from ufemism2_tpu.core.mesh_data import build_mesh_data
from ufemism2_tpu.core.ice.masks import determine_masks, calc_mask_noice
from ufemism2_tpu.core.ice.subgrid import (calc_effective_thickness,
                                           calc_grounded_fractions_bilin_TAF)
from ufemism2_tpu.core.ice.geometry import (ice_surface_elevation,
                                            thickness_above_flotation)
from ufemism2_tpu.utils.constants import ice_density, seawater_density


@pytest.fixture(scope="module")
def md(small_mesh):
    return build_mesh_data(small_mesh)


def test_geometry_relations():
    # grounded: Hs = Hi + Hb
    assert float(ice_surface_elevation(1000.0, 100.0, 0.0)) == 1100.0
    # floating: Hs = Hi * (1 - rho_i/rho_sw)
    hs = float(ice_surface_elevation(1000.0, -2000.0, 0.0))
    np.testing.assert_allclose(hs, 1000.0 * (1 - ice_density
                                             / seawater_density))
    assert float(thickness_above_flotation(1000.0, 100.0, 0.0)) == 1000.0


def test_determine_masks(md):
    nV = md.nV
    V = np.asarray(md.V)
    # left half grounded ice, right half ocean
    Hi = jnp.asarray(np.where(V[:, 0] < 0, 1000.0, 0.0))
    Hb = jnp.asarray(np.where(V[:, 0] < 0, 100.0, -2000.0))
    SL = jnp.zeros(nV)
    m = determine_masks(md, Hi, Hb, SL)
    assert bool(m["mask_grounded_ice"].any())
    assert bool(m["mask_icefree_ocean"].any())
    assert not bool((m["mask_grounded_ice"] & m["mask_icefree_ocean"]).any())
    # margin vertices are ice vertices adjacent to no-ice
    assert bool(m["mask_margin"].any())
    # coastline between land and ocean should be empty here (land is iced)
    assert bool(m["mask_cf_gr"].any()) or bool(m["mask_margin"].any())


def test_effective_thickness(md):
    nV = md.nV
    Hi = jnp.full(nV, 500.0)
    Hb = jnp.full(nV, -2000.0)
    SL = jnp.zeros(nV)
    Hi_eff, fm = calc_effective_thickness(md, Hi, Hb, SL)
    np.testing.assert_allclose(np.asarray(fm), 1.0)   # full cells
    np.testing.assert_allclose(np.asarray(Hi_eff), 500.0)


def test_grounded_fractions(md):
    nV = md.nV
    V = np.asarray(md.V)
    # TAF crosses zero at x=0
    Hi = jnp.full(nV, 1000.0)
    Hb = jnp.asarray(-1000.0 * ice_density / seawater_density
                     + V[:, 0] / 100.0)
    SL = jnp.zeros(nV)
    m = determine_masks(md, Hi, Hb, SL)
    fg = calc_grounded_fractions_bilin_TAF(md, Hi, Hb, SL,
                                           m["mask_floating_ice"])
    fg = np.asarray(fg)
    assert (fg >= 0).all() and (fg <= 1).all()
    assert fg[V[:, 0] > 10e3].min() > 0.99
    assert fg[V[:, 0] < -10e3].max() < 0.01


def test_mask_noice(md):
    m = calc_mask_noice(md, "none")
    assert not bool(m.any())
    m = calc_mask_noice(md, "MISMIP_mod")
    assert not bool(m.any())  # small domain, all within 900 km


def test_sliding_laws(md):
    from ufemism2_tpu.core.ice.sliding import calc_basal_friction_coefficient
    nV = md.nV
    Hi = jnp.full(nV, 1000.0)
    Hb = jnp.full(nV, 100.0)
    SL = jnp.zeros(nV)
    m = determine_masks(md, Hi, Hb, SL)
    fg = jnp.ones(nV)
    u = jnp.full(nV, 100.0)
    v = jnp.zeros(nV)
    slope = jnp.zeros(nV)
    for law in ["Weertman", "Coulomb", "Budd", "Tsai2015", "Schoof2005",
                "Zoet-Iverson"]:
        C = Config(choice_sliding_law=law,
                   choice_basal_hydrology_model="Martin2011")
        from ufemism2_tpu.core.ice.ssadiva import _bed_roughness_fields
        rough = _bed_roughness_fields(C, md)
        beta = calc_basal_friction_coefficient(
            C, md, rough, u, v, Hi, Hi, Hb, SL, slope, fg, m)
        beta = np.asarray(beta)
        assert np.isfinite(beta).all() and (beta >= 0).all(), law
        # friction decreases (or stays) with speed for velocity-weakening
        # laws: tau = beta*u should increase with u
        C2 = Config(choice_sliding_law=law,
                    choice_basal_hydrology_model="Martin2011")
        beta2 = np.asarray(calc_basal_friction_coefficient(
            C2, md, rough, u * 2, v, Hi, Hi, Hb, SL, slope, fg, m))
        tau1, tau2 = beta * 100.0, beta2 * 200.0
        assert (tau2 >= tau1 * 0.99).all(), law


def test_thermo_pieces(md):
    from ufemism2_tpu.core.ice.thermodynamics import (
        calc_heat_capacity, calc_thermal_conductivity,
        calc_pressure_melting_point)
    C = Config(choice_ice_heat_capacity="Pounder1965",
               choice_ice_thermal_conductivity="Ritz1987")
    Ti = jnp.full((md.nV, md.nz), 260.0)
    cp = np.asarray(calc_heat_capacity(C, Ti))
    k = np.asarray(calc_thermal_conductivity(C, Ti))
    assert 1800 < cp.mean() < 2200
    assert 5e7 < k.mean() < 9e7     # J yr^-1 m^-1 K^-1
    pmp = np.asarray(calc_pressure_melting_point(md, jnp.full(md.nV, 3000.0)))
    assert pmp[:, 0].max() <= 273.16 + 1e-9
    assert (pmp[:, -1] < pmp[:, 0]).all()


def test_hydrology_variants():
    """All non-transient hydrology choices (basal_hydrology_main.f90)."""
    from ufemism2_tpu.core.ice.hydrology import run_basal_hydrology
    from ufemism2_tpu.utils.constants import ice_density, grav
    Hi_eff = jnp.asarray([1000.0, 500.0, 0.0])
    Hb = jnp.asarray([100.0, -300.0, -500.0])
    SL = jnp.zeros(3)
    m_gr = jnp.asarray([True, True, False])
    P_o = ice_density * grav * np.asarray(Hi_eff)

    for choice in ("none", "Martin2011", "Leguy2014",
                   "error_function_Martin2011", "error_function_constant"):
        C = Config(choice_basal_hydrology_model=choice)
        pore, over, eff = run_basal_hydrology(C, Hi_eff, Hb, SL,
                                              mask_grounded_ice=m_gr)
        np.testing.assert_allclose(np.asarray(over), P_o)
        assert (np.asarray(eff) >= 0).all()
        assert (np.asarray(eff) <= P_o + 1e-6).all()

    # Leguy2014: bed above sea level -> full overburden; deep bed -> reduced
    C = Config(choice_basal_hydrology_model="Leguy2014")
    _, _, eff = run_basal_hydrology(C, Hi_eff, Hb, SL, mask_grounded_ice=m_gr)
    np.testing.assert_allclose(float(eff[0]), P_o[0])
    assert float(eff[1]) < P_o[1]
    # error_function_constant saturates at N_max
    C = Config(choice_basal_hydrology_model="error_function_constant")
    _, _, eff = run_basal_hydrology(C, Hi_eff, Hb, SL)
    assert float(eff[0]) <= C.error_function_max_effective_pressure


def test_bedrock_cdf_grounded_fractions(small_mesh):
    """Bedrock-CDF sub-grid grounded fractions
    (subgrid_grounded_fractions_bedrock_CDF.f90 + CDF construction)."""
    import jax.numpy as jnp
    from ufemism2_tpu.core.ice.bedrock_cdf import calc_bedrock_cdfs
    from ufemism2_tpu.core.ice.subgrid import (
        calc_grounded_fractions_bedrock_cdf, calc_grounded_fractions)

    mesh = small_mesh
    md = build_mesh_data(mesh)
    # raw grid: bedrock dips from 0 at x=-50km to -1000 at x=+50km with
    # +-100 m sub-grid noise
    x = np.linspace(-50e3, 50e3, 200)
    y = np.linspace(-50e3, 50e3, 200)
    X, Y = np.meshgrid(x, y, indexing="ij")
    rng = np.random.default_rng(42)
    Hb_grid = -1000.0 * (X + 50e3) / 100e3 + rng.uniform(-100, 100, X.shape)
    cdf_a, cdf_b = calc_bedrock_cdfs(mesh, x, y, Hb_grid, nbins=11)
    assert cdf_a.shape == (mesh.nV, 11)
    # CDFs are monotone non-decreasing
    assert (np.diff(cdf_a, axis=1) >= -1e-9).all()
    assert (np.diff(cdf_b, axis=1) >= -1e-9).all()

    # thick ice everywhere -> fully grounded; no ice over deep bed -> afloat
    Hi = jnp.full(mesh.nV, 3000.0)
    SL = jnp.zeros(mesh.nV)
    dHb = jnp.zeros(mesh.nV)
    fr = calc_grounded_fractions_bedrock_cdf(Hi, SL, dHb, jnp.asarray(cdf_a))
    np.testing.assert_allclose(np.asarray(fr), 1.0)
    # 300 m ice: Hb_float = -275 m; bed is above that on the west
    # (-200..0 m), below it on the east (-1000..-800 m)
    Hi0 = jnp.full(mesh.nV, 300.0)
    fr0 = np.asarray(calc_grounded_fractions_bedrock_cdf(
        Hi0, SL, dHb, jnp.asarray(cdf_a)))
    xv = mesh.V[:, 0]
    assert (fr0[xv < -35e3] > 0.95).all()    # shallow side grounded
    assert (fr0[xv > 35e3] < 0.05).all()     # deep side afloat
    # partial fractions exist near the flotation line
    assert ((fr0 > 0.05) & (fr0 < 0.95)).any()

    # blended dispatcher runs and stays within [0, 1]
    C = Config(choice_subgrid_grounded_fraction="bilin_interp_TAF+bedrock_CDF")
    Hb_v = jnp.asarray(-1000.0 * (mesh.V[:, 0] + 50e3) / 100e3)
    m_fl = jnp.asarray(np.asarray(Hi0) < -np.asarray(Hb_v) * 1.028)
    mask_border_b = jnp.asarray((mesh.TriC < 0).any(axis=1))
    fa, fb = calc_grounded_fractions(
        C, md, Hi0, Hb_v, SL, m_fl, dHb=dHb,
        bedrock_cdfs=(jnp.asarray(cdf_a), jnp.asarray(cdf_b), mask_border_b))
    assert fa.shape == (mesh.nV,) and fb.shape == (mesh.nTri,)
    assert (np.asarray(fa) >= 0).all() and (np.asarray(fa) <= 1).all()
    assert (np.asarray(fb) >= 0).all() and (np.asarray(fb) <= 1).all()


def test_till_yield_stress_matches_reference(md):
    """Pin the Coulomb/Budd/Zoet-Iverson till yield stress to the
    reference's LITERAL formula tau_y = N_eff * tan(pi/180) * phi_deg
    (sliding_laws.f90:158,214,379 - the reference linearises tan at
    1 degree; it does NOT compute tan(phi*pi/180)), at till friction
    angles 5 / 20 / 35 degrees."""
    from ufemism2_tpu.core.ice.sliding import calc_basal_friction_coefficient
    from ufemism2_tpu.core.ice.hydrology import run_basal_hydrology
    from ufemism2_tpu.utils.constants import pi

    nV = md.nV
    Hi = jnp.full(nV, 1000.0)
    Hb = jnp.full(nV, 100.0)
    SL = jnp.zeros(nV)
    m = determine_masks(md, Hi, Hb, SL)
    fg = jnp.ones(nV)
    u = jnp.full(nV, 100.0)
    v = jnp.zeros(nV)
    slope = jnp.zeros(nV)

    for phi_deg in (5.0, 20.0, 35.0):
        for law in ("Coulomb", "Budd", "Zoet-Iverson"):
            C = Config(choice_sliding_law=law,
                       choice_basal_hydrology_model="Martin2011")
            rough = {"beta_sq": jnp.full(nV, 1.0e4),
                     "till_friction_angle": jnp.full(nV, phi_deg),
                     "alpha_sq": jnp.full(nV, 0.5)}
            beta = np.asarray(calc_basal_friction_coefficient(
                C, md, rough, u, v, Hi, Hi, Hb, SL, slope, fg, m))

            # expectation straight from sliding_laws.f90
            _, _, N_eff = run_basal_hydrology(
                C, Hi, Hb, SL, mask_grounded_ice=m["mask_grounded_ice"])
            N_eff = np.asarray(N_eff)
            uabs = np.sqrt(C.slid_delta_v ** 2 + 100.0 ** 2)
            tau_y = N_eff * np.tan(pi / 180.0) * phi_deg
            if law == "Coulomb":
                want = tau_y / uabs
            elif law == "Budd":
                q = C.slid_Budd_q_plastic
                want = tau_y * uabs ** (q - 1.0) \
                    / C.slid_Budd_u_threshold ** q
            else:
                p = C.slid_ZI_p
                want = (tau_y * uabs ** (1.0 / p - 1.0)
                        * (uabs + C.slid_ZI_ut) ** (-1.0 / p))
            want = np.minimum(C.slid_beta_max, want)
            interior = np.asarray(m["mask_grounded_ice"]
                                  & ~m["mask_gl_gr"] & ~m["mask_cf_gr"])
            np.testing.assert_allclose(beta[interior], want[interior],
                                       rtol=1e-6, err_msg=f"{law}@{phi_deg}")


def test_vertical_velocity_slab(small_mesh):
    """Conservation-of-mass w on a flat slab with uniform divergence
    du/dx = a: dw/dz = -a exactly (vertical_velocities.f90 derivation),
    so w(surface) = -a * H with w(base) = 0."""
    from ufemism2_tpu.core.ice.thermodynamics import (
        calc_zeta_gradients, calc_vertical_velocities)

    m = small_mesh
    md = build_mesh_data(m)
    nV, nTri, nz = m.nV, m.nTri, m.nz
    Hi = jnp.full(nV, 1000.0)
    Hb = jnp.zeros(nV)
    SL = jnp.full(nV, -2000.0)
    a = 1e-3
    u_b = jnp.asarray(a * m.TriGC[:, 0])[:, None] * jnp.ones((1, nz))
    v_b = jnp.zeros((nTri, nz))
    u_a = md.M_map_b_a @ u_b
    v_a = md.M_map_b_a @ v_b
    masks = determine_masks(md, Hi, Hb, SL)
    z0 = jnp.zeros(nV)
    dzx, dzy, dzz, _ = calc_zeta_gradients(md, Hi, Hb + Hi, z0, z0)
    w = np.asarray(calc_vertical_velocities(
        Config(), md, masks, Hi, Hb, z0, z0, u_b, v_b, u_a, v_a,
        dzx, dzy, dzz, z0))
    inner = np.hypot(m.V[:, 0], m.V[:, 1]) < 30e3
    expect = -a * (1.0 - np.asarray(m.zeta)) * 1000.0
    assert abs(w[inner, 0].mean() - expect[0]) < 0.01
    assert np.abs(w[inner] - expect[None, :]).max() < 0.35
    assert np.all(w[inner, -1] == 0.0)


def test_siassa_no_sliding_equals_sia(small_mesh):
    """SIA/SSA with choice_sliding_law='no_sliding': the SSA part is
    identically zero and the reference skips its solve entirely
    (SSA_main.f90:125-130); solving with beta=0 instead gives a
    free-slip membrane that runs away to vel_max (the round-4 ISMIP-HOM
    SIASSA entries at u ~ 5000 m/yr). Hybrid must equal pure SIA."""
    from ufemism2_tpu.core.ice.pc import make_solve_stress_balance

    m = small_mesh
    md = build_mesh_data(m)
    r = np.hypot(m.V[:, 0], m.V[:, 1])
    Hi = jnp.asarray(np.maximum(0.0, 2000.0 * (1 - (r / 60e3) ** 2)))
    Hb = jnp.zeros(m.nV)
    SL = jnp.full(m.nV, -2000.0)
    Hs = Hb + Hi
    Ti = jnp.full((m.nV, m.nz), 263.15)

    class S:
        pass

    s = S()
    s.u_vav_b = jnp.zeros(m.nTri)
    s.v_vav_b = jnp.zeros(m.nTri)
    s.u_3D_b = jnp.zeros((m.nTri, m.nz))
    s.v_3D_b = jnp.zeros((m.nTri, m.nz))
    s.visc_tau_bx = jnp.zeros(m.nTri)
    s.visc_tau_by = jnp.zeros(m.nTri)
    s.visc_eta_3D_b = jnp.full((m.nTri, m.nz), 1e4)
    s.dHb = jnp.zeros(m.nV)

    out = {}
    for choice in ("SIA", "SIA/SSA"):
        C = Config(choice_stress_balance_approximation=choice,
                   choice_sliding_law="no_sliding",
                   choice_ice_rheology_Glen="uniform",
                   uniform_Glens_flow_factor=1e-16)
        solve = make_solve_stress_balance(C, md)
        u_vav, v_vav, u3, v3, nvi, nai, _aux = solve(
            md, Hi, Hs, Hb, SL, Ti, s)
        out[choice] = np.asarray(u_vav)
    np.testing.assert_allclose(out["SIA/SSA"], out["SIA"],
                               rtol=1e-12, atol=1e-12)
    # the runaway mode pinned the whole field at vel_max (~5000 m/yr
    # everywhere incl. the ice-free margin); genuine SIA leaves the
    # margin at rest
    assert np.abs(out["SIA/SSA"]).min() < 1.0, "hybrid ran away"
