"""Lateral mass balance (calving-front) models.

Re-design of src/UFEMISM/lateral_mass_balance/ (LMB_main.f90): choices
uniform / GlacialIndex. LMB applies at calving-front vertices.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_run_lmb(C, md, region_name: str):
    choice = getattr(C, f"choice_LMB_model_{region_name}")
    nV = md.nV
    dtype = md.A.dtype

    if choice == "uniform":
        def run(time, s, masks):
            cf = masks["mask_cf_fl"] | masks["mask_cf_gr"]
            return jnp.where(cf, C.uniform_LMB, 0.0).astype(dtype)
        return run

    raise NotImplementedError(f"choice_LMB_model '{choice}' not implemented")
