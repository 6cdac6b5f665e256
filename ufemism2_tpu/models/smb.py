"""Surface mass balance models.

Re-design of src/UFEMISM/surface_mass_balance/ (SMB_model.f90 dispatch,
SMB_idealised.f90, SMB_IMAU_ITM.f90): choices uniform / idealised
(uniform, EISMINT1 A-F, Halfar_static) / prescribed / IMAU-ITM
(insolation-temperature-melt).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.constants import pi, T0, L_fusion, ice_density
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
        V = np.asarray(md.V)
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
        return make_run_smb_imau_itm(C, md, region_name)

    raise NotImplementedError(f"choice_SMB_model '{choice}' not implemented")


def make_run_smb_imau_itm(C, md, region_name):
    """IMAU insolation-temperature-melt SMB model (SMB_IMAU_ITM.f90).

    Monthly melt from temperature + insolation + albedo; refreezing from
    superimposed-ice formation; requires a climate model providing monthly
    T2m, Precip, and insolation Q_TOA.
    """
    c_abl_const = C.SMB_IMAUITM_C_abl_constant_NAM if region_name == "NAM" \
        else getattr(C, f"SMB_IMAUITM_C_abl_constant_{region_name}")
    c_abl_Ts = getattr(C, f"SMB_IMAUITM_C_abl_Ts_{region_name}")
    c_abl_Q = getattr(C, f"SMB_IMAUITM_C_abl_Q_{region_name}")
    c_refr = getattr(C, f"SMB_IMAUITM_C_refr_{region_name}")
    albedo_ice = C.SMB_IMAUITM_albedo_ice
    albedo_snow = C.SMB_IMAUITM_albedo_snow
    albedo_land = C.SMB_IMAUITM_albedo_land
    albedo_water = C.SMB_IMAUITM_albedo_water

    def run(time, s=None, climate=None):
        if climate is None:
            raise ValueError("IMAU-ITM requires a climate model")
        T2m = climate["T2m"]            # [nV, 12]
        Precip = climate["Precip"]      # [nV, 12] m w.e./month
        Q_TOA = climate.get("Q_TOA")    # [nV, 12] W m^-2
        if Q_TOA is None:
            Q_TOA = jnp.zeros_like(T2m)

        # snow fraction (Ohmura et al., 1999)
        snowfrac = jnp.maximum(0.0, jnp.minimum(1.0, 1.0 - 0.5 * (
            T2m - T0 + 2.0)))
        snowfall = Precip * snowfrac
        rainfall = Precip - snowfall

        # background albedo: simple ice/land split (full firn-depth history
        # arrives with the coupled run framework)
        albedo = jnp.where(s.Hi[:, None] > 0.1, albedo_snow, albedo_land)

        melt = jnp.maximum(0.0, (T2m - T0) * c_abl_Ts
                           + c_abl_Q * (1.0 - albedo) * Q_TOA
                           - c_abl_const) / (L_fusion * 1000.0) * 12.0
        melt = melt / 12.0
        refreezing = jnp.minimum(
            c_refr * jnp.maximum(0.0, T0 - T2m) * snowfall, melt + rainfall)
        runoff = melt + rainfall - refreezing
        smb_monthly = snowfall + refreezing - melt
        smb = smb_monthly.sum(axis=1) * 1000.0 / ice_density
        return smb
    return run
