"""Sub-grid schemes: effective thickness / margin fraction, grounded fractions.

Vectorised re-design of src/UFEMISM/ice_dynamics/utilities/
subgrid_ice_margin.f90 (calc_effective_thickness) and
subgrid_grounded_fractions_* (bilinear-TAF variant).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..mesh_data import MeshData
from .masks import is_floating
from .geometry import thickness_above_flotation


def calc_effective_thickness(md: MeshData, Hi, Hb, SL):
    """Returns (Hi_eff, fraction_margin) (subgrid_ice_margin.f90:19)."""
    nbr_Hi = jnp.where(md.mask_C, Hi[md.C], jnp.inf)  # inf so "== 0" is False
    m_margin = (Hi > 0.0) & ((nbr_Hi == 0.0).any(axis=1))
    m_float = is_floating(Hi, Hb, SL)

    # defaults
    fraction = jnp.where(~m_float | (Hi > 0.0), 1.0, 0.0)
    Hi_eff = jnp.where(~m_float | (Hi > 0.0), Hi, 0.0)

    # max ice thickness among non-margin neighbours (floating margins only)
    nbr_margin = m_margin[md.C] & md.mask_C
    nbr_Hi_valid = jnp.where(md.mask_C & ~nbr_margin, Hi[md.C], 0.0)
    Hi_nbr_max = jnp.where(m_float, nbr_Hi_valid.max(axis=1), 0.0)

    apply = m_margin & (Hi_nbr_max > Hi)
    Hi_eff = jnp.where(apply, Hi_nbr_max, Hi_eff)
    fraction = jnp.where(apply, Hi / jnp.maximum(Hi_nbr_max, 1e-30), fraction)
    return Hi_eff, fraction


def calc_grounded_fractions_bilin_TAF(md: MeshData, Hi, Hb, SL, mask_floating):
    """Sub-grid grounded fractions from thickness-above-flotation.

    a-grid: fraction of the Voronoi cell grounded, estimated from the sign
    mix of TAF at the vertex and its neighbours; b-grid: per-triangle from
    its three vertices (reference subgrid_grounded_fractions_bilin_interp).
    """
    TAF = thickness_above_flotation(Hi, Hb, SL)

    # a-grid: per-connection sub-areas grounded where TAF interpolated > 0.
    # Linear interpolation along each connection: fraction of the segment
    # with TAF>0, averaged over connections (lightweight approximation of
    # the bilinear sub-cell integral; exact on fully grounded/floating).
    TAF_n = jnp.where(md.mask_C, TAF[md.C], 0.0)
    Ti, Tj = TAF[:, None], TAF_n
    denom = jnp.where(jnp.abs(Ti - Tj) < 1e-30, 1e-30, Ti - Tj)
    lam = jnp.clip(Ti / denom, 0.0, 1.0)      # point where TAF crosses 0
    seg_gr = jnp.where(Ti > 0, lam, 1.0 - lam)
    seg_gr = jnp.where((Ti > 0) == (Tj > 0), jnp.where(Ti > 0, 1.0, 0.0),
                       seg_gr)
    w = md.mask_C.astype(TAF.dtype)
    fraction_gr = (seg_gr * w).sum(1) / jnp.maximum(w.sum(1), 1.0)
    # fully grounded/floating cells exactly 1/0
    all_gr = (Ti > 0).squeeze(-1) & ((Tj > 0) | ~md.mask_C).all(axis=1)
    all_fl = (Ti <= 0).squeeze(-1) & ((Tj <= 0) | ~md.mask_C).all(axis=1)
    fraction_gr = jnp.where(all_gr, 1.0, jnp.where(all_fl, 0.0, fraction_gr))
    return fraction_gr


def calc_grounded_fractions_b_from_a(md: MeshData, Tri, fraction_gr_a):
    """b-grid grounded fraction = mean over the triangle's vertices."""
    return fraction_gr_a[Tri].mean(axis=1)
