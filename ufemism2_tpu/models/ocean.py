"""Ocean models: 3-D T/S fields and ice-draft properties.

Re-design of src/UFEMISM/ocean/ (ocean_main.f90:174-186): choices none /
idealised / realistic / snapshot variants. Vertical axis: ocean depth grid
(0 .. ocean_vertical_grid_max_depth, spacing dz).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .bmb import ocean_freezing_point_at_draft


def ocean_depth_axis(C):
    return np.arange(0.0, C.ocean_vertical_grid_max_depth + 1e-9,
                     C.ocean_vertical_grid_dz)


def make_run_ocean(C, md, region_name: str):
    """Returns run(time, state) -> dict(T [nV,nd], S [nV,nd], T_draft,
    S_draft, T_freezing_point)."""
    choice = getattr(C, f"choice_ocean_model_{region_name}")
    nV = md.nV
    dtype = md.A.dtype
    depths = jnp.asarray(ocean_depth_axis(C), dtype)
    nd = depths.shape[0]

    def _draft_properties(Tf, Sf, s):
        draft = s.Hib
        depth = jnp.maximum(0.0, s.SL - draft)
        # interpolate T,S at draft depth
        idx = jnp.clip(jnp.searchsorted(depths, depth) - 1, 0, nd - 2)
        w = (depth - depths[idx]) / (depths[idx + 1] - depths[idx])
        T_draft = Tf[jnp.arange(nV), idx] * (1 - w) \
            + Tf[jnp.arange(nV), idx + 1] * w
        S_draft = Sf[jnp.arange(nV), idx] * (1 - w) \
            + Sf[jnp.arange(nV), idx + 1] * w
        Tfp = ocean_freezing_point_at_draft(S_draft, draft)
        return dict(T=Tf, S=Sf, T_draft=T_draft, S_draft=S_draft,
                    T_freezing_point=Tfp, depths=depths)

    if choice == "none":
        Tf = jnp.full((nV, nd), -1.9, dtype)
        Sf = jnp.full((nV, nd), 34.0, dtype)
        return lambda time, s: _draft_properties(Tf, Sf, s)

    if choice == "idealised":
        sub = C.choice_ocean_model_idealised
        if sub in ("MISMIPplus_WARM", "MISMIPplus_COLD"):
            # ISOMIP+ WARM/COLD profiles (Asay-Davis et al. 2016, Table 4)
            T_top, T_bot = (-1.9, 1.0) if sub.endswith("WARM") else (-1.9, -1.9)
            S_top, S_bot = 33.8, 34.7
            zd = 720.0
            frac = jnp.clip(depths / zd, 0.0, 1.0)
            Tprof = T_top + (T_bot - T_top) * frac
            Sprof = S_top + (S_bot - S_top) * frac
            Tf = jnp.broadcast_to(Tprof[None, :], (nV, nd))
            Sf = jnp.broadcast_to(Sprof[None, :], (nV, nd))
            return lambda time, s: _draft_properties(Tf, Sf, s)
        raise ValueError(f"unknown choice_ocean_model_idealised '{sub}'")

    raise NotImplementedError(f"choice_ocean_model '{choice}' not implemented")
