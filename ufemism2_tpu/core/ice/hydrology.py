"""Basal hydrology: pore-water / overburden / effective pressure.

Re-derivation of src/UFEMISM/basal_hydrology/basal_hydrology_main.f90:
'none' and Martin2011 pore-water models (the Salle2025 transient till model
and the error-function variants arrive with the full hydrology subsystem).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.constants import ice_density, seawater_density, grav


def calc_pore_water_pressure_none(Hi_eff):
    return jnp.zeros_like(Hi_eff)


def calc_pore_water_fraction_martin2011(C, Hb, SL):
    """Martin et al. (2011) Eq. 12 pore-water scaling factor."""
    return jnp.clip(
        1.0 - (Hb - SL - C.Martin2011_hydro_Hb_min)
        / (C.Martin2011_hydro_Hb_max - C.Martin2011_hydro_Hb_min),
        0.0, 1.0)


def run_basal_hydrology(C, Hi_eff, Hb, SL):
    """Returns (pore_water_pressure, overburden_pressure,
    effective_pressure)."""
    choice = C.choice_basal_hydrology_model
    overburden = ice_density * grav * Hi_eff
    if choice == "none":
        pore = jnp.zeros_like(Hi_eff)
    elif choice == "Martin2011":
        # Martin et al. (2011) Eq. 11
        frac = calc_pore_water_fraction_martin2011(C, Hb, SL)
        pore = 0.96 * ice_density * grav * Hi_eff * frac
    else:
        raise NotImplementedError(
            f"choice_basal_hydrology_model '{choice}' not yet implemented")
    eff = jnp.maximum(0.0, overburden - pore)
    return pore, overburden, eff
