"""Basic ice-geometry relations (surface elevation, flotation).

Re-derivation of src/UPSY/basic/math_utilities/ice_geometry_basics.f90.
jnp versions run on device inside jit; *_np variants are host-side numpy
used during mesh building.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...utils.constants import ice_density, seawater_density


def ice_surface_elevation(Hi, Hb, SL):
    """Hs = Hi + max(SL - rho_i/rho_sw * Hi, Hb)."""
    return Hi + jnp.maximum(SL - ice_density / seawater_density * Hi, Hb)


def thickness_above_flotation(Hi, Hb, SL):
    """TAF = Hi - max(0, (SL - Hb) * rho_sw/rho_i)."""
    return Hi - jnp.maximum(0.0, (SL - Hb) * (seawater_density / ice_density))


def Hi_from_Hb_Hs_and_SL(Hb, Hs, SL):
    Hi_float = jnp.maximum(0.0, (SL - Hb) * (seawater_density / ice_density))
    Hs_float = Hb + Hi_float
    return jnp.where(
        Hs > Hs_float,
        Hs - Hb,
        jnp.minimum(Hi_float, (Hs - SL) / (1.0 - ice_density / seawater_density)))


def height_of_water_column_at_ice_front(Hi, Hb, SL):
    return jnp.minimum(jnp.maximum(SL - Hb, 0.0),
                       ice_density / seawater_density * Hi)


# ---- numpy variants for host-side mesh building ---------------------------

def ice_surface_elevation_np(Hi, Hb, SL):
    return Hi + np.maximum(SL - ice_density / seawater_density * Hi, Hb)


def thickness_above_flotation_np(Hi, Hb, SL):
    return Hi - np.maximum(0.0, (SL - Hb) * (seawater_density / ice_density))
