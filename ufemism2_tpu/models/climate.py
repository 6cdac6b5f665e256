"""Climate models: monthly T2m and precipitation on the mesh.

Re-design of src/UFEMISM/climate/ (climate_main.f90:188-206 dispatch):
choices none / idealised / realistic / snapshot+-deltaT / matrix.
Idealised EISMINT1 surface temperatures (Huybrechts et al. 1996).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.constants import pi, T0


def make_run_climate(C, md, region_name: str):
    """Returns run(time, state) -> dict(T2m [nV,12], Precip [nV,12])."""
    choice = getattr(C, f"choice_climate_model_{region_name}")
    nV = md.nV
    dtype = md.A.dtype

    if choice == "none":
        T2m = jnp.full((nV, 12), T0 - 20.0, dtype)
        Pr = jnp.zeros((nV, 12), dtype)
        return lambda time, s=None: {"T2m": T2m, "Precip": Pr}

    if choice == "idealised":
        sub = C.choice_climate_model_idealised
        V = np.asarray(md.V)
        d_km = jnp.asarray(np.sqrt(V[:, 0] ** 2 + V[:, 1] ** 2) / 1e3, dtype)

        if sub.startswith("EISMINT1_"):
            exp = sub[-1]

            def run(time, s=None):
                # Huybrechts et al. (1996) Eqs. 9/11/12
                if exp in "ABC":
                    Tsum = 238.15 + 1.67e-2 * d_km * 1e3 / 1e3  # placeholder
                    T_base = 270.0 - 0.01 * d_km * 0  # moving margin: use Ts(d)
                    Ts = 238.15 + 1.67e-5 * (d_km * 1e3)
                else:
                    h = s.Hs if s is not None else jnp.zeros(nV, dtype)
                    Ts = 239.0 + 8e-8 * (d_km * 1e3) ** 3
                if exp in ("B", "E"):
                    Ts = Ts + 10.0 * jnp.sin(2 * pi * time / 20e3)
                elif exp in ("C", "F"):
                    Ts = Ts + 10.0 * jnp.sin(2 * pi * time / 40e3)
                T2m = jnp.broadcast_to(Ts[:, None], (nV, 12))
                return {"T2m": T2m, "Precip": jnp.zeros((nV, 12), dtype)}
            return run
        raise ValueError(f"unknown choice_climate_model_idealised '{sub}'")

    if choice in ("realistic", "snapshot_plus_uniform_deltaT",
                  "snapshot_plus_transient_deltaT", "matrix",
                  "SMB_snapshot_plus_anomalies"):
        raise NotImplementedError(
            f"choice_climate_model '{choice}' requires the NetCDF input "
            "layer (arrives with realistic-forcing support)")

    raise ValueError(f"unknown choice_climate_model '{choice}'")
