"""Climate matrix method: CO2 + absorbed-insolation interpolation between
GCM snapshots (Berends et al. 2018).

Re-design of src/UFEMISM/climate/climate_matrix.f90: at init, read the
PD-observed climate and the PI/warm/cold GCM snapshots (with winds),
bias-correct warm/cold against (PI - PD_obs), derive each snapshot's
spatially-variable lapse rate (NAM/EAS) and reference absorbed insolation
I_abs (by spinning the IMAU-ITM albedo scheme for 10 years on the
snapshot climate, climate_matrix.f90:738-865). At run time, interpolate
temperature via w_tot(CO2, I_abs) (Eqs. 1-6, 8-11) and precipitation via
ice-geometry weights with Clausius-Clapeyron (GRL/ANT, Eq. 13-14) or
Roe&Lindzen (NAM/EAS, Eqs. 12, A3-A7) downscaling.

The runner carries its own IMAU-ITM albedo state (the reference reads the
SMB model's Albedo field; here the same scheme is stepped internally on
the applied climate, avoiding a circular climate<->SMB dependency).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.constants import pi, T0, sec_per_year
from .smb import imau_itm_params, imau_itm_step


W_CUTOFF_T = 0.5     # temperature-weight crop (climate_matrix.f90:121)
W_CUTOFF_P = 0.25    # precipitation-weight crop (:320)


def _read_snapshot_with_winds(C, mesh, fname, dtype):
    from ..io.input_files import (read_field_from_file_2D,
                                  read_field_from_file_2D_monthly)
    snap = {}
    snap["Hs"] = jnp.asarray(read_field_from_file_2D(fname, "Hs", mesh),
                             dtype)
    snap["T2m"] = jnp.asarray(
        read_field_from_file_2D_monthly(fname, "T2m", mesh), dtype)
    snap["Precip"] = jnp.asarray(
        read_field_from_file_2D_monthly(fname, "Precip", mesh), dtype)
    for key, canon in (("Wind_WE", "Wind_WE||uas"),
                       ("Wind_SN", "Wind_SN||vas")):
        try:
            snap[key] = jnp.asarray(
                read_field_from_file_2D_monthly(fname, canon, mesh), dtype)
        except KeyError:
            snap[key] = jnp.zeros_like(snap["T2m"])
    snap["Wind_LR"], snap["Wind_DU"] = rotate_wind_to_model_mesh(
        mesh, snap["Wind_WE"], snap["Wind_SN"])
    return snap


def rotate_wind_to_model_mesh(mesh, wind_WE, wind_SN):
    """Geographic zonal/meridional winds -> model-x/y components
    (climate_model_utilities.f90:287-332)."""
    lambda_M = mesh.proj[0] if mesh.proj is not None else 0.0
    ang = np.deg2rad(np.asarray(mesh.lon) - (lambda_M - 90.0))[:, None]
    s, c = jnp.asarray(np.sin(ang)), jnp.asarray(np.cos(ang))
    wind_LR = wind_WE * s + wind_SN * c
    wind_DU = -wind_WE * c + wind_SN * s
    return wind_LR, wind_DU


def _smooth(md, f, n_pass=8):
    """Neighbour-average smoothing standing in for the reference's
    gridded Gaussian filter (~160-200 km)."""
    from .bed_roughness import smooth_field
    return smooth_field(md, f, n_pass=n_pass, w_smooth=0.5)


def _spatially_variable_lapserate(C, md, snap_PI, snap):
    """Berends et al. 2018 Eq. 10 (climate_matrix.f90:587-736)."""
    lam_const = C.climate_matrix_constant_lapserate
    mask = snap["Hs"] > snap_PI["Hs"] + 100.0
    n_non = jnp.maximum((~mask).sum() * 12, 1)
    dT_nonice = jnp.where(~mask[:, None],
                          snap["T2m"] - snap_PI["T2m"], 0.0).sum() / n_non
    lam_ice = jnp.clip(
        -(snap["T2m"] - (snap_PI["T2m"] + dT_nonice))
        / jnp.maximum(snap["Hs"] - snap_PI["Hs"], 1.0)[:, None],
        0.002, 0.05).mean(axis=1)
    lam_mean_ice = jnp.where(mask, lam_ice, 0.0).sum() \
        / jnp.maximum(mask.sum(), 1)
    lam = jnp.where(mask, lam_ice, lam_mean_ice)
    lam = _smooth(md, lam)
    return lam * (lam_const / jnp.maximum(lam_mean_ice, 1e-12))


def _calc_I_abs(C, md, region_name, snap, insol, orbit_time, mask_noice):
    """Reference absorbed insolation: run the IMAU-ITM albedo scheme for
    10 years on the snapshot climate (climate_matrix.f90:738-865)."""
    from ..core.ice.masks import determine_masks
    p = imau_itm_params(C, region_name)
    Q_TOA = insol.at_time(orbit_time)
    nV = md.nV
    dtype = md.A.dtype
    Hs_min = snap["Hs"].min()
    ocean = snap["Hs"] == Hs_min
    grounded = (snap["Hs"] > 100.0) & (snap["T2m"].mean(axis=1) < 0.0)
    masks = dict(mask_icefree_ocean=ocean, mask_grounded_ice=grounded,
                 mask_floating_ice=jnp.zeros(nV, bool))
    firn = jnp.full((nV, 12), C.SMB_IMAUITM_initial_firn_thickness, dtype)
    melt_yr = jnp.zeros(nV, dtype)
    albedo = None
    for _ in range(10):
        _, aux = imau_itm_step(p, snap["T2m"], snap["Precip"], Q_TOA,
                               masks, mask_noice, firn, melt_yr)
        firn, melt_yr, albedo = (aux["FirnDepth"], aux["MeltPreviousYear"],
                                 aux["Albedo"])
    return (Q_TOA * (1.0 - albedo)).sum(axis=1), Q_TOA


def precipitation_model_roe(T2m, dHs_dx, dHs_dy, wind_LR, wind_DU):
    """Roe (2002) / Roe & Lindzen (2001) orographic precipitation
    (climate_model_utilities.f90:238-285). [m w.e./yr]"""
    e_sat0, c_one, c_two = 611.2, 17.67, 243.5
    a_par, b_par, alpha = 2.5e-11, 5.9e-9, 100.0
    upwind = jnp.maximum(0.0, wind_LR * dHs_dx + wind_DU * dHs_dy)
    E_sat = e_sat0 * jnp.exp(c_one * (T2m - T0) / (c_two + T2m - T0))
    x0 = a_par / b_par + upwind
    err = jax.scipy.special.erf(alpha * jnp.abs(x0))
    return (b_par * E_sat) * (
        x0 / 2.0 + x0 ** 2 * err / (2.0 * jnp.abs(x0))
        + jnp.exp(-alpha ** 2 * x0 ** 2) / (2.0 * jnp.sqrt(pi) * alpha)
    ) * sec_per_year


def adapt_precip_CC(Hs, Hs_ref, T_ref, P_ref, region_name, lapse_const):
    """Clausius-Clapeyron precipitation downscaling
    (climate_model_utilities.f90:110-177)."""
    T_inv_ref = 88.9 + 0.67 * T_ref
    T_inv = 88.9 + 0.67 * (T_ref - lapse_const
                           * (Hs - Hs_ref)[:, None])
    if region_name == "GRL":
        return P_ref * 1.04 ** (T_inv - T_inv_ref)
    return P_ref * (T_inv_ref / T_inv) ** 2 \
        * jnp.exp(22.47 * (T0 / T_inv_ref - T0 / T_inv))


def adapt_precip_roe(md, Hs1, T2m1, wLR, wDU, P1, Hs2, T2m2):
    """Roe&Lindzen ratio downscaling (climate_model_utilities.f90:178-235);
    PD-observed winds are used for both states (as the reference does)."""
    dHs_dx1 = (md.M_ddx_a_a @ Hs1)[:, None]
    dHs_dy1 = (md.M_ddy_a_a @ Hs1)[:, None]
    dHs_dx2 = (md.M_ddx_a_a @ Hs2)[:, None]
    dHs_dy2 = (md.M_ddy_a_a @ Hs2)[:, None]
    P_RL1 = precipitation_model_roe(T2m1, dHs_dx1, dHs_dy1, wLR, wDU)
    P_RL2 = precipitation_model_roe(T2m2, dHs_dx2, dHs_dy2, wLR, wDU)
    ratio = jnp.clip(P_RL2 / jnp.maximum(P_RL1, 1e-300), 0.01, 2.0)
    return P1 * ratio


class MatrixClimate:
    """run(time, state) for choice_climate_model == 'matrix'."""

    def __init__(self, C, md, region_name, mesh):
        if mesh is None:
            raise ValueError("matrix climate needs the host mesh")
        from ..core.ice.masks import calc_mask_noice
        from ..io.input_files import read_series_from_file
        from .insolation import InsolationForcing

        dtype = md.A.dtype
        self.C, self.md, self.region = C, md, region_name
        self.p_itm = imau_itm_params(C, region_name)
        self.mask_noice = calc_mask_noice(
            md, getattr(C, "choice_mask_noice", "none"))

        self.PD_obs = _read_snapshot_with_winds(
            C, mesh, C.climate_matrix_filename_PD_obs_climate, dtype)
        self.GCM_PI = _read_snapshot_with_winds(
            C, mesh, C.climate_matrix_filename_climate_snapshot_PI, dtype)
        self.warm = _read_snapshot_with_winds(
            C, mesh, C.climate_matrix_filename_climate_snapshot_warm, dtype)
        self.cold = _read_snapshot_with_winds(
            C, mesh, C.climate_matrix_filename_climate_snapshot_cold, dtype)

        # GCM bias vs present-day observations (:519-557)
        lam_c = C.climate_matrix_constant_lapserate
        bias_T = (self.GCM_PI["T2m"] + self.GCM_PI["Hs"][:, None] * lam_c) \
            - (self.PD_obs["T2m"] + self.PD_obs["Hs"][:, None] * lam_c)
        bias_P = self.GCM_PI["Precip"] \
            / jnp.maximum(self.PD_obs["Precip"], 1e-300)
        if C.climate_matrix_biascorrect_warm:
            self.warm["T2m"] = self.warm["T2m"] - bias_T
            self.warm["Precip"] = self.warm["Precip"] / bias_P
        if C.climate_matrix_biascorrect_cold:
            self.cold["T2m"] = self.cold["T2m"] - bias_T
            self.cold["Precip"] = self.cold["Precip"] / bias_P

        # lapse rates (:477-488)
        self.warm["lambda"] = jnp.full(md.nV, lam_c, dtype)
        if region_name in ("NAM", "EAS"):
            self.cold["lambda"] = _spatially_variable_lapserate(
                C, md, self.GCM_PI, self.cold)
        else:
            self.cold["lambda"] = jnp.full(md.nV, lam_c, dtype)

        # insolation + reference absorbed insolation
        self.insol = InsolationForcing(C, mesh, dtype)
        self.warm["I_abs"], _ = _calc_I_abs(
            C, md, region_name, self.warm, self.insol,
            C.climate_matrix_warm_orbit_time, self.mask_noice)
        self.cold["I_abs"], _ = _calc_I_abs(
            C, md, region_name, self.cold, self.insol,
            C.climate_matrix_cold_orbit_time, self.mask_noice)

        # CO2 forcing record
        if C.choice_matrix_forcing == "CO2_direct":
            tt, vv = read_series_from_file(C.filename_CO2_record, "CO2")
            self._co2_t = jnp.asarray(tt, dtype)
            self._co2_v = jnp.asarray(vv, dtype)
        else:
            raise ValueError("matrix climate requires choice_matrix_forcing"
                             " = 'CO2_direct' (d18O inversion not in the "
                             "reference either, climate_matrix.f90:144)")

        # carried IMAU-ITM albedo state for modelled I_abs
        nV = md.nV
        self._firn = jnp.full((nV, 12),
                              C.SMB_IMAUITM_initial_firn_thickness, dtype)
        self._melt_yr = jnp.zeros(nV, dtype)
        self._albedo = jnp.full((nV, 12), self.p_itm["albedo_snow"], dtype)
        self._T2m = self.PD_obs["T2m"]
        self._Precip = self.PD_obs["Precip"]
        self.w_CO2vsice = getattr(C,
                                  f"climate_matrix_CO2vsice_{region_name}")

    def carry_state_from(self, old, remap):
        """Transfer the carried albedo/firn state and the last applied
        climate across a mesh update (`remap`: [nV_old(,k)] ->
        [nV_new(,k)]); the reference remaps climate-model state on mesh
        update (UFEMISM_main_model.f90:1311-1323)."""
        self._firn = remap(old._firn)
        self._melt_yr = remap(old._melt_yr)
        self._albedo = remap(old._albedo)
        self._T2m = remap(old._T2m)
        self._Precip = remap(old._Precip)

    def __call__(self, time, s=None):
        from ..core.ice.masks import determine_masks
        C, md = self.C, self.md
        Q_TOA = self.insol.at_time(time)
        CO2 = jnp.interp(jnp.asarray(time, self._co2_t.dtype),
                         self._co2_t, self._co2_v)

        # advance the internal albedo model one year on the last applied
        # climate (stands in for the SMB model's Albedo, see module doc)
        masks = determine_masks(md, s.Hi, s.Hb, s.SL)
        _, aux = imau_itm_step(self.p_itm, self._T2m, self._Precip, Q_TOA,
                               masks, self.mask_noice, self._firn,
                               self._melt_yr)
        self._firn = aux["FirnDepth"]
        self._melt_yr = aux["MeltPreviousYear"]
        self._albedo = aux["Albedo"]

        # --- temperature (run_climate_model_matrix_temperature :100-203)
        w_CO2 = jnp.clip((CO2 - C.climate_matrix_low_CO2_level)
                         / (C.climate_matrix_high_CO2_level
                            - C.climate_matrix_low_CO2_level),
                         -W_CUTOFF_T, 1.0 + W_CUTOFF_T)
        I_abs = (Q_TOA * (1.0 - self._albedo)).sum(axis=1)
        denom = self.warm["I_abs"] - self.cold["I_abs"]
        w_ins = jnp.clip((I_abs - self.cold["I_abs"])
                         / jnp.where(jnp.abs(denom) > 1e-10, denom, 1.0),
                         -W_CUTOFF_T, 1.0 + W_CUTOFF_T)
        w_ins_av = jnp.clip((I_abs.sum() - self.cold["I_abs"].sum())
                            / jnp.maximum(jnp.abs(
                                self.warm["I_abs"].sum()
                                - self.cold["I_abs"].sum()), 1e-10)
                            * jnp.sign(self.warm["I_abs"].sum()
                                       - self.cold["I_abs"].sum()),
                            -W_CUTOFF_T, 1.0 + W_CUTOFF_T)
        w_ins_smooth = _smooth(md, w_ins)
        if self.region in ("NAM", "EAS"):
            w_ice = (w_ins + 3.0 * w_ins_smooth + 3.0 * w_ins_av) / 7.0
        else:
            w_ice = (w_ins_smooth + 6.0 * w_ins_av) / 7.0
        w_tot = self.w_CO2vsice * w_CO2 \
            + (1.0 - self.w_CO2vsice) * w_ice

        Hs_GCM = w_tot * self.warm["Hs"] + (1 - w_tot) * self.cold["Hs"]
        lam_GCM = w_tot * self.warm["lambda"] \
            + (1 - w_tot) * self.cold["lambda"]
        T_ref = w_tot[:, None] * self.warm["T2m"] \
            + (1 - w_tot)[:, None] * self.cold["T2m"]
        T2m = T_ref - lam_GCM[:, None] * (s.Hs - Hs_GCM)[:, None]

        # --- precipitation (run_climate_model_matrix_precipitation :287)
        # total-ice-volume weight (Berends 2018 Eq. 12's second term);
        # guarded against identical warm/cold orographies (0/0)
        dHs_sum = self.cold["Hs"].sum() - self.warm["Hs"].sum()
        w_tot_p = jnp.where(
            jnp.abs(dHs_sum) > 1e-6,
            jnp.clip((s.Hs.sum() - self.warm["Hs"].sum())
                     / jnp.where(jnp.abs(dHs_sum) > 1e-6, dHs_sum, 1.0),
                     -W_CUTOFF_P, 1.0 + W_CUTOFF_P),
            0.5)
        if self.region in ("NAM", "EAS"):
            PI_Hs = self.GCM_PI["Hs"]
            warm_ice = self.warm["Hs"] >= PI_Hs + 50.0
            cold_ice = self.cold["Hs"] >= PI_Hs + 50.0
            local = jnp.clip((s.Hs - PI_Hs)
                             / jnp.where(cold_ice | warm_ice,
                                         self.cold["Hs"] - PI_Hs, 1.0)
                             * w_tot_p, -W_CUTOFF_P, 1.0 + W_CUTOFF_P)
            w_cold = jnp.where(warm_ice | cold_ice, local,
                               jnp.clip(w_tot_p, -W_CUTOFF_P,
                                        1.0 + W_CUTOFF_P))
            w_cold = _smooth(md, w_cold * w_tot_p)
            w_warm = 1.0 - w_cold
        else:
            w_cold = jnp.full(md.nV, w_tot_p, T2m.dtype)
            w_warm = 1.0 - w_cold
        if C.climate_matrix_switch_glacial_index_precip:
            w_cold = jnp.full(md.nV, 1.0 - jnp.clip(
                (CO2 - C.climate_matrix_low_CO2_level)
                / (C.climate_matrix_high_CO2_level
                   - C.climate_matrix_low_CO2_level),
                -W_CUTOFF_P, 1.0 + W_CUTOFF_P), T2m.dtype)
            w_warm = 1.0 - w_cold

        T_ref_p = w_warm[:, None] * self.warm["T2m"] \
            + w_cold[:, None] * self.cold["T2m"]
        P_ref = jnp.exp(
            w_warm[:, None] * jnp.log(jnp.maximum(self.warm["Precip"],
                                                  1e-300))
            + w_cold[:, None] * jnp.log(jnp.maximum(self.cold["Precip"],
                                                    1e-300)))
        Hs_ref_p = w_warm * self.warm["Hs"] + w_cold * self.cold["Hs"]

        if self.region in ("NAM", "EAS"):
            Precip = adapt_precip_roe(
                md, Hs_ref_p, T_ref_p, self.PD_obs["Wind_LR"],
                self.PD_obs["Wind_DU"], P_ref, s.Hs, T2m)
        else:
            Precip = adapt_precip_CC(s.Hs, Hs_ref_p, T_ref_p, P_ref,
                                     self.region,
                                     C.climate_matrix_constant_lapserate)

        self._T2m, self._Precip = T2m, Precip
        return {"T2m": T2m, "Precip": Precip, "Q_TOA": Q_TOA,
                "Wind_LR": self.PD_obs["Wind_LR"],
                "Wind_DU": self.PD_obs["Wind_DU"]}


def make_run_climate_matrix(C, md, region_name, mesh):
    return MatrixClimate(C, md, region_name, mesh)
