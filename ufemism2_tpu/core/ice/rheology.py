"""Ice rheology: Glen's flow law factor A(T).

Re-derivation of src/UFEMISM/ice_dynamics/rheology/constitutive_equation.f90:
uniform or Huybrechts (1992) Arrhenius temperature-dependent flow factor,
with grounded/floating enhancement factors ('separate' or grounded-fraction
'interp' transition).
"""

from __future__ import annotations

import jax.numpy as jnp

# Arrhenius parameters (constitutive_equation.f90:94-97, Huybrechts 1992)
_T_SWITCH = 263.15    # [K]
_A_LOW = 1.14e-05     # [Pa^-3 yr^-1]
_A_HIGH = 5.47e+10    # [Pa^-3 yr^-1]
_Q_LOW = 6.0e+04      # [J mol^-1]
_Q_HIGH = 13.9e+04    # [J mol^-1]
_R_GAS = 8.314


def calc_ice_rheology_glen(C, md, Hi, Hs, Ti, mask_grounded, mask_floating,
                           fraction_gr=None, Hib=None, SL=None):
    """A_flow [nV, nz] in Pa^-n yr^-1."""
    choice = C.choice_ice_rheology_Glen
    if choice == "uniform":
        A0 = C.uniform_Glens_flow_factor
        if md is not None and md.extras and "glen_A_scale" in md.extras:
            # dynamic multiplier: MISMIP+ flow-factor tuning adjusts it
            # between coupling intervals WITHOUT re-tracing the step
            # (inversion_utilities.f90 MISMIPplus_adapt_flow_factor)
            A0 = A0 * md.x("glen_A_scale").astype(Ti.dtype)
        A = jnp.broadcast_to(jnp.asarray(A0, Ti.dtype), Ti.shape)
    elif choice == "Huybrechts1992":
        A = jnp.where(Ti < _T_SWITCH,
                      _A_LOW * jnp.exp(-_Q_LOW / (_R_GAS * Ti)),
                      _A_HIGH * jnp.exp(-_Q_HIGH / (_R_GAS * Ti)))
    else:
        raise ValueError(f"unknown choice_ice_rheology_Glen '{choice}'")

    # flow enhancement factors
    trans = C.choice_enhancement_factor_transition
    if trans == "separate":
        enh = jnp.where(mask_grounded, C.m_enh_sheet,
                        jnp.where(mask_floating, C.m_enh_shelf, 1.0))
    elif trans == "interp":
        if fraction_gr is None:
            enh = jnp.where(mask_grounded, C.m_enh_sheet,
                            jnp.where(mask_floating, C.m_enh_shelf, 1.0))
        else:
            below_sl = (Hi > 0) & (Hib < SL) if Hib is not None else \
                mask_floating
            enh_i = (fraction_gr * C.m_enh_sheet
                     + (1 - fraction_gr) * C.m_enh_shelf)
            enh = jnp.where(below_sl, enh_i,
                            jnp.where(mask_grounded, C.m_enh_sheet,
                                      jnp.where(mask_floating,
                                                C.m_enh_shelf, 1.0)))
    else:
        raise ValueError(
            f"unknown choice_enhancement_factor_transition '{trans}'")
    return A * enh[:, None]
