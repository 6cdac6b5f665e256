"""Surface mass balance models.

Re-design of src/UFEMISM/surface_mass_balance/ (SMB_model.f90 dispatch,
SMB_idealised.f90, SMB_IMAU_ITM.f90): choices uniform / idealised
(uniform, EISMINT1 A-F, Halfar_static) / prescribed / IMAU-ITM
(insolation-temperature-melt).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.constants import pi, T0, L_fusion, ice_density, sec_per_year
from ..core.analytical import halfar_dHdt


def make_run_smb(C, md, region_name: str):
    """Returns run(time, state) -> SMB [m ice/yr] on the a-grid."""
    choice = getattr(C, f"choice_SMB_model_{region_name}")
    nV = md.nV
    dtype = md.A.dtype

    if choice == "uniform":
        val = jnp.full(nV, C.uniform_SMB, dtype)
        return lambda time, s=None, climate=None: val

    if choice == "idealised":
        sub = C.choice_SMB_model_idealised
        # vertex coordinates from the HOST mesh: np.asarray(md.V) is a
        # device_get that blocks on every async compile/dispatch queued
        # during model init (measured 359 s of init's 378 s through the
        # remote-device tunnel)
        host = getattr(md, "_host_mesh", None)
        V = host.V if host is not None else np.asarray(md.V)
        if sub in ("uniform", ""):
            # '' appears in reference configs (e.g. the MISMIP 8 km scaling
            # config) whose SMB is just the uniform accumulation rate
            val = jnp.full(nV, C.uniform_SMB, dtype)
            return lambda time, s=None, climate=None: val
        if sub.startswith("EISMINT1_"):
            d_km = jnp.asarray(np.sqrt(V[:, 0] ** 2 + V[:, 1] ** 2) / 1e3)
            srate = 1e-2  # [m yr^-1 km^-1] Huybrechts et al. 1996
            exp = sub[-1]

            def run(time, s=None, climate=None):
                if exp in "ABC":
                    if exp == "A":
                        R_el = 450.0
                    elif exp == "B":
                        R_el = 450.0 + 100.0 * jnp.sin(2 * pi * time / 20e3)
                    else:
                        R_el = 450.0 + 100.0 * jnp.sin(2 * pi * time / 40e3)
                    return jnp.minimum(0.5, srate * (R_el - d_km))
                if exp == "D":
                    return jnp.full(nV, 0.3, dtype)
                if exp == "E":
                    return jnp.full(nV, 1.0, dtype) * (
                        0.3 + 0.2 * jnp.sin(2 * pi * time / 20e3))
                return jnp.full(nV, 1.0, dtype) * (
                    0.3 + 0.2 * jnp.sin(2 * pi * time / 40e3))
            return run
        if sub == "Halfar_static":
            # SMB exactly cancels the Halfar thinning rate at t=0, keeping
            # the dome static (SMB_idealised.f90:273)
            smb = -halfar_dHdt(C.uniform_Glens_flow_factor,
                               C.Glens_flow_law_exponent,
                               C.refgeo_idealised_Halfar_H0,
                               C.refgeo_idealised_Halfar_R0,
                               V[:, 0], V[:, 1], 0.0)
            val = jnp.asarray(smb, dtype)
            return lambda time, s=None, climate=None: val
        raise ValueError(f"unknown choice_SMB_model_idealised '{sub}'")

    if choice == "IMAU-ITM":
        return ImauItmSMB(C, md, region_name)

    if choice == "prescribed":
        return _make_run_prescribed(C, md, region_name)

    if choice == "snapshot_plus_anomalies":
        return _make_run_snapshot_plus_anomalies(C, md, region_name)

    if choice == "reconstructed":
        return _make_run_reconstructed(C, md, region_name)

    raise NotImplementedError(f"choice_SMB_model '{choice}' not implemented")


def _make_run_snapshot_plus_anomalies(C, md, region_name):
    """Baseline SMB snapshot + time-interpolated SMB anomaly field
    (SMB_snapshot_plus_anomalies.f90:275-400; ISMIP6 aSMB forcing).
    Anomaly series device-preloaded; run is jit-pure."""
    mesh = getattr(md, "_host_mesh", None)
    if mesh is None:
        raise ValueError("SMB snapshot_plus_anomalies needs the host mesh")
    from ..io.input_files import (read_field_from_file_2D,
                                  load_timeframe_series)
    dtype = md.A.dtype
    smb0 = jnp.asarray(read_field_from_file_2D(
        C.SMB_snp_p_anml_filename_snapshot_SMB, "SMB", mesh), dtype)
    tt, dS = load_timeframe_series(C.SMB_snp_p_anml_filename_anomalies,
                                   "SMB_anomaly", mesh, reader="2D")
    tt_j = jnp.asarray(tt, dtype)
    dS_j = jnp.asarray(dS, dtype)

    def run(time, s=None, climate=None):
        t = jnp.clip(jnp.asarray(time, dtype), tt_j[0], tt_j[-1])
        i = jnp.clip(jnp.searchsorted(tt_j, t) - 1, 0, len(tt) - 2)
        w = (t - tt_j[i]) / (tt_j[i + 1] - tt_j[i])
        return smb0 + (1 - w) * dS_j[i] + w * dS_j[i + 1]
    return run


def _make_run_reconstructed(C, md, region_name):
    """Patagonia reconstructed SMB (SMB_reconstructed.f90:130-240):
    elevation-banded SMB inside the Patagonia ROI polygon (positive
    above the ELA at 500 m, maximal at 1500 m, desertified by 2500 m),
    flux-divergence-limited ablation outside, with two smoothing passes
    blending the transition."""
    if C.choice_regions_of_interest != "Patagonia":
        raise ValueError("reconstructed SMB only implemented for "
                         "choice_regions_of_interest == 'Patagonia' "
                         "(as in the reference)")
    from ..mesh.roi_polygons import calc_roi_polygon
    from matplotlib.path import Path as MplPath
    from .bed_roughness import smooth_field

    dtype = md.A.dtype
    poly = calc_roi_polygon("Patagonia")
    inside = jnp.asarray(
        MplPath(poly).contains_points(
            md._host_mesh.V if getattr(md, "_host_mesh", None) is not None
            else np.asarray(md.V)))
    Hs_ela, Hs_tla, Hs_dla = 500.0, 1500.0, 2500.0
    SMB_max, SMB_min = 2.0, -10.0

    def run(time, s=None, climate=None):
        Hs = s.Hs
        rising = SMB_max * jnp.clip((Hs - Hs_ela) / (Hs_tla - Hs_ela),
                                    0.0, 1.0)
        falling = SMB_max * (1.0 - jnp.clip(
            (Hs - Hs_tla) / (Hs_dla - Hs_tla), 0.0, 1.0))
        smb_in = jnp.where(Hs <= Hs_tla, rising, falling)
        smb_out = jnp.minimum(0.0, jnp.maximum(SMB_min, s.divQ - 0.5))
        smb = jnp.where(inside, smb_in, smb_out).astype(dtype)
        # blend with a smoothed copy inside the ROI (weight ~ elevation)
        smb_sm = smooth_field(md, smb, n_pass=4)
        w = jnp.clip(Hs / Hs_dla, 0.0, 1.0)
        smb = jnp.where(inside, w * smb + (1 - w) * smb_sm, smb)
        # outside: fully smoothed (second pass)
        smb_sm2 = smooth_field(md, smb, n_pass=4)
        return jnp.where(inside, smb, smb_sm2)
    return run


def _make_run_prescribed(C, md, region_name):
    """Time-constant SMB read from a file (SMB_prescribed.f90)."""
    mesh = getattr(md, "_host_mesh", None)
    fname = getattr(C, f"filename_SMB_prescribed_{region_name}", "")
    if mesh is None or not fname:
        raise ValueError("prescribed SMB needs filename_SMB_prescribed_"
                         f"{region_name} and the host mesh on md")
    from ..io.input_files import read_field_from_file_2D
    val = jnp.asarray(read_field_from_file_2D(fname, "SMB", mesh),
                      md.A.dtype)
    return lambda time, s=None, climate=None: val


def imau_itm_params(C, region_name):
    return dict(
        c_abl_const=getattr(C, f"SMB_IMAUITM_C_abl_constant_{region_name}"),
        c_abl_Ts=getattr(C, f"SMB_IMAUITM_C_abl_Ts_{region_name}"),
        c_abl_Q=getattr(C, f"SMB_IMAUITM_C_abl_Q_{region_name}"),
        c_refr=getattr(C, f"SMB_IMAUITM_C_refr_{region_name}"),
        albedo_ice=C.SMB_IMAUITM_albedo_ice,
        albedo_snow=C.SMB_IMAUITM_albedo_snow,
        albedo_soil=C.SMB_IMAUITM_albedo_soil,
        albedo_water=C.SMB_IMAUITM_albedo_water,
    )


def imau_itm_step(p, T2m, Precip, Q_TOA, masks, mask_noice,
                  firn_prev, melt_prev_yr):
    """One year of the IMAU insolation-temperature-melt SMB model
    (SMB_IMAU_ITM.f90 run_SMB_model_IMAU_ITM:420-519), as a pure function.

    Inputs: monthly climate [nV,12], ice masks, and the carried state
    (FirnDepth [nV,12] in m snow, MeltPreviousYear [nV] in m w.e.).
    Returns (SMB [m ice/yr], aux dict with the updated state).

    The 12-month firn/albedo recurrence (month m uses month m-1's firn
    depth, January uses last year's December) runs as a lax.scan.
    """
    from jax import lax

    water_sfc = (masks["mask_icefree_ocean"]
                 & ~masks["mask_floating_ice"]) | mask_noice
    ice_sfc = masks["mask_grounded_ice"] | masks["mask_floating_ice"]
    albedo_surf = jnp.full(T2m.shape[0], p["albedo_soil"], T2m.dtype)
    albedo_surf = jnp.where(water_sfc, p["albedo_water"], albedo_surf)
    albedo_surf = jnp.where(ice_sfc, p["albedo_ice"], albedo_surf)

    # snow fraction (ANICE 'realistic' fractions, :469)
    snowfrac = jnp.clip(0.5 * (1.0 - jnp.arctan((T2m - T0) / 3.5)
                               / 1.25664), 0.0, 1.0)
    snowfall = Precip * snowfrac
    rainfall = Precip - snowfall

    def month(firn_dec, mth):
        T_m, Q_m, snow_m = mth
        albedo = jnp.minimum(p["albedo_snow"], jnp.maximum(
            albedo_surf,
            p["albedo_snow"] - (p["albedo_snow"] - albedo_surf)
            * jnp.exp(-15.0 * firn_dec) - 0.015 * melt_prev_yr))
        albedo = jnp.where(water_sfc, p["albedo_water"], albedo)
        # Bintanja et al. (2002) ablation [m w.e./month]
        melt = jnp.maximum(0.0, (p["c_abl_Ts"] * (T_m - T0)
                                 + p["c_abl_Q"] * (1.0 - albedo) * Q_m
                                 - p["c_abl_const"])
                           * sec_per_year / (L_fusion * 1000.0 * 12.0))
        firn = jnp.clip(firn_dec + snow_m - melt, 0.0, 10.0)
        return firn, (albedo, melt, firn)

    xs = (T2m.T, Q_TOA.T, snowfall.T)      # leading month axis for scan
    _, (albedo, melt, firn) = lax.scan(month, firn_prev[:, -1], xs)
    albedo, melt, firn = albedo.T, melt.T, firn.T   # back to [nV, 12]

    # yearly refreezing (Janssens & Huybrechts 2000), spread over months
    sup_imp_wat = p["c_refr"] * jnp.maximum(0.0, T0 - T2m.mean(axis=1))
    liquid_water = rainfall.sum(axis=1) + melt.sum(axis=1)
    refreezing_year = jnp.minimum(
        jnp.minimum(jnp.minimum(sup_imp_wat, liquid_water),
                    Precip.sum(axis=1)),
        0.25 * firn.mean(axis=1))
    # no refreezing where there is no ice at all (the reference line at
    # :500 uses .or., which zeroes it everywhere - the intended semantics)
    refreezing_year = jnp.where(ice_sfc, refreezing_year, 0.0)

    smb_monthly = snowfall + refreezing_year[:, None] / 12.0 - melt
    SMB = smb_monthly.sum(axis=1) * 1000.0 / ice_density   # m w.e. -> m ice
    return SMB, dict(FirnDepth=firn, MeltPreviousYear=melt.sum(axis=1),
                     Albedo=albedo,
                     SMB_monthly=smb_monthly * 1000.0 / ice_density)


class ImauItmSMB:
    """Stateful IMAU-ITM runner: carries FirnDepth / MeltPreviousYear /
    Albedo across calls (the reference's type_SMB_model_IMAU_ITM fields).
    Not fused into the jit component dispatch (it mutates host-held
    state), matching the reference's once-per-dt_SMB cadence."""

    def __init__(self, C, md, region_name):
        from ..core.ice.masks import determine_masks, calc_mask_noice
        self.p = imau_itm_params(C, region_name)
        self.md = md
        self._determine_masks = determine_masks
        self.mask_noice = calc_mask_noice(
            md, getattr(C, f"choice_mask_noice_{region_name}",
                        getattr(C, "choice_mask_noice", "none")))
        nV = md.nV
        dtype = md.A.dtype
        init_choice = getattr(C, f"choice_SMB_IMAUITM_init_firn_{region_name}")
        if init_choice == "uniform":
            self.FirnDepth = jnp.full((nV, 12),
                                      C.SMB_IMAUITM_initial_firn_thickness,
                                      dtype)
        elif init_choice == "read_from_file":
            mesh = getattr(md, "_host_mesh", None)
            from ..io.input_files import read_field_from_file_2D_monthly
            fname = getattr(C, f"filename_SMB_IMAUITM_init_firn_"
                            f"{region_name}", "")
            self.FirnDepth = jnp.asarray(
                read_field_from_file_2D_monthly(fname, "FirnDepth", mesh),
                dtype)
        else:
            raise ValueError("unknown choice_SMB_IMAUITM_init_firn "
                             f"'{init_choice}'")
        self.MeltPreviousYear = jnp.zeros(nV, dtype)
        self.Albedo = jnp.full((nV, 12), self.p["albedo_snow"], dtype)

    def carry_state_from(self, old, remap):
        """Transfer the firn/melt/albedo state across a mesh update
        (remap_SMB_model_IMAU_ITM in the reference): `remap` maps
        [nV_old(,k)] -> [nV_new(,k)]."""
        self.FirnDepth = remap(old.FirnDepth)
        self.MeltPreviousYear = remap(old.MeltPreviousYear)
        self.Albedo = remap(old.Albedo)

    def __call__(self, time, s=None, climate=None):
        if climate is None:
            raise ValueError("IMAU-ITM requires a climate model")
        Q_TOA = climate.get("Q_TOA")
        if Q_TOA is None:
            raise ValueError("IMAU-ITM requires insolation (Q_TOA) from "
                             "the climate model (set "
                             "choice_insolation_forcing)")
        masks = self._determine_masks(self.md, s.Hi, s.Hb, s.SL)
        SMB, aux = imau_itm_step(self.p, climate["T2m"], climate["Precip"],
                                 Q_TOA, masks, self.mask_noice,
                                 self.FirnDepth, self.MeltPreviousYear)
        self.FirnDepth = aux["FirnDepth"]
        self.MeltPreviousYear = aux["MeltPreviousYear"]
        self.Albedo = aux["Albedo"]
        return SMB
