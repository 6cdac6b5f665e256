"""Glacial isostatic adjustment models.

Re-design of src/UFEMISM/glacial_isostatic_adjustment/: choices none / ELRA
(elastic lithosphere, relaxing asthenosphere). The ELRA Green's-function
convolution runs on the square GIA grid in the reference; here it is a
spectral (FFT) solve on a regular grid covering the domain, remapped
to/from the mesh by nearest-sampling - a TPU-friendly O(N log N) form of
the same Kelvin-function convolution.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.constants import ice_density, seawater_density, grav


def make_run_gia(C, md, region_name: str, mesh):
    choice = C.choice_GIA_model
    nV = md.nV
    dtype = md.A.dtype

    if choice == "none":
        zero = jnp.zeros(nV, dtype)
        return lambda time, s, dt: (zero, zero)   # (dHb_dt, dHb)

    if choice == "ELRA":
        # regular grid covering the domain
        dx = C.dx_GIA
        x = np.arange(mesh.xmin, mesh.xmax + dx / 2, dx)
        y = np.arange(mesh.ymin, mesh.ymax + dx / 2, dx)
        nx, ny = len(x), len(y)
        # mesh->grid nearest sampling indices
        from scipy.spatial import cKDTree
        tree = cKDTree(mesh.V)
        X, Y = np.meshgrid(x, y, indexing="ij")
        _, g2m = tree.query(np.stack([X.ravel(), Y.ravel()], 1))
        g2m = jnp.asarray(g2m.reshape(nx, ny))
        gtree = cKDTree(np.stack([X.ravel(), Y.ravel()], 1))
        _, m2g = gtree.query(mesh.V)
        m2g = jnp.asarray(m2g)

        # flexural rigidity response in spectral space:
        # w_eq(k) = -rho_i g H / (rho_m g + D k^4)
        D_flex = C.ELRA_lithosphere_flex_rigidity
        tau = C.ELRA_bedrock_relaxation_time
        kx = 2 * np.pi * np.fft.fftfreq(nx, dx)
        ky = 2 * np.pi * np.fft.fftfreq(ny, dx)
        KX, KY = np.meshgrid(kx, ky, indexing="ij")
        k4 = (KX ** 2 + KY ** 2) ** 2
        denom = jnp.asarray(C.ELRA_mantle_density * grav + D_flex * k4)

        def run(time, s, dt):
            # grid load anomaly (ice + ocean)
            load_m = jnp.where(s.TAF > 0, ice_density * s.Hi,
                               jnp.where(s.Hb + s.dHb < s.SL,
                                         -seawater_density * (s.SL - s.Hb),
                                         0.0))
            load = load_m[g2m]
            w_eq_hat = -grav * jnp.fft.fft2(load) / denom
            w_eq = jnp.real(jnp.fft.ifft2(w_eq_hat))
            dHb_eq_m = w_eq.ravel()[m2g]
            # relaxation toward equilibrium
            dHb_dt = (dHb_eq_m - s.dHb) / tau
            dHb_new = s.dHb + dHb_dt * dt
            return dHb_dt, dHb_new
        return run

    raise NotImplementedError(f"choice_GIA_model '{choice}' not implemented")
