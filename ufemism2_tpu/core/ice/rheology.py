"""Ice rheology: Glen's flow law factor A(T).

Re-derivation of src/UFEMISM/ice_dynamics/utilities/constitutive_equation.f90:
uniform or temperature-dependent (Huybrechts 1992 / EISMINT Arrhenius) flow
factor, with an enhancement factor per grounded/floating regime.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.constants import T0, Clausius_Clapeyron_gradient


# Arrhenius parameters (Huybrechts 1992; standard EISMINT values)
_A_LOW = 1.14e-5    # [Pa^-3 yr^-1] for T* < 263.15 K
_Q_LOW = 6.0e4      # [J mol^-1]
_A_HIGH = 5.47e10
_Q_HIGH = 13.9e4
_R = 8.314


def calc_ice_rheology_glen(C, md, Hi, Hs, Ti, mask_grounded, mask_floating):
    """A_flow [nV, nz] in Pa^-n yr^-1."""
    choice = C.choice_ice_rheology_Glen
    nz = md.nz
    if choice == "uniform":
        A = jnp.full(Ti.shape, C.uniform_Glens_flow_factor, Ti.dtype)
    elif choice == "calc_from_temperature":
        # pressure-corrected homologous temperature
        depth = md.zeta[None, :] * Hi[:, None]
        T_pmp_offset = Clausius_Clapeyron_gradient * depth
        T_hom = Ti + T_pmp_offset
        A = jnp.where(T_hom < 263.15,
                      _A_LOW * jnp.exp(-_Q_LOW / (_R * T_hom)),
                      _A_HIGH * jnp.exp(-_Q_HIGH / (_R * T_hom)))
    else:
        raise ValueError(f"unknown choice_ice_rheology_Glen '{choice}'")

    # enhancement factors
    enh = jnp.where(mask_floating[:, None],
                    C.m_enh_shelf, C.m_enh_sheet)
    return A * enh
