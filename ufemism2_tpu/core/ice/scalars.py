"""Integrated ice-sheet scalars: area, volume, VAF, mass fluxes.

Re-design of src/UFEMISM/ice_dynamics/utilities/ice_mass_and_fluxes.f90:
area-weighted reductions over the (sharded) vertex axis; psum over chips.
Volumes reported in metres sea-level equivalent, fluxes in Gt/yr
(matching the reference's scalar_output_files.f90 units).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.constants import ice_density, seawater_density, ocean_area
from .geometry import thickness_above_flotation


def calc_ice_scalars(md, Hi, Hb, SL, fraction_gr, SMB, BMB, LMB,
                     roi_mask=None):
    """Returns dict of integrated scalars; roi_mask [nV] restricts the
    reductions to a region of interest (ice_mass_and_fluxes_ROI.f90)."""
    A = md.A if roi_mask is None else jnp.where(roi_mask, md.A, 0.0)
    has_ice = Hi > 0.1
    TAF = thickness_above_flotation(Hi, Hb, SL)

    area = jnp.where(has_ice, A, 0.0).sum()
    # m sea-level equivalent
    sle = ice_density / (seawater_density * ocean_area)
    volume = (jnp.where(has_ice, Hi * A, 0.0)).sum() * sle
    volume_af = (jnp.where(has_ice, jnp.maximum(0.0, TAF) * A, 0.0)).sum() \
        * sle

    to_Gt = ice_density * 1e-12  # m^3 ice -> Gt
    SMB_total = (SMB * A).sum() * to_Gt
    BMB_total = (BMB * A).sum() * to_Gt
    LMB_total = (LMB * A).sum() * to_Gt
    return dict(ice_area=area, ice_volume=volume, ice_volume_af=volume_af,
                SMB_total=SMB_total, BMB_total=BMB_total,
                LMB_total=LMB_total)
