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
        # real FFT in f32: TPU has no complex128, and c64 suffices for
        # the smooth flexural response
        kx = 2 * np.pi * np.fft.fftfreq(nx, dx)
        ky = 2 * np.pi * np.fft.rfftfreq(ny, dx)
        KX, KY = np.meshgrid(kx, ky, indexing="ij")
        k4 = (KX ** 2 + KY ** 2) ** 2
        # FFT precision follows the run precision: downcast to f32 only
        # in the f32 perf mode (or when complex128 is unavailable, i.e.
        # x64 is off) - double-precision CPU runs keep f64 deformation.
        import jax as _jax
        fft_dtype = (jnp.float32
                     if (C.tpu_precision == "f32"
                         or not _jax.config.jax_enable_x64)
                     else jnp.float64)
        denom = jnp.asarray(C.ELRA_mantle_density * grav + D_flex * k4,
                            fft_dtype)

        def surface_load(Hi, Hb, SL, TAF):
            return jnp.where(TAF > 0, ice_density * Hi,
                             jnp.where(Hb < SL,
                                       -seawater_density * (SL - Hb),
                                       0.0))

        # GIA-equilibrium reference load (GIA_ELRA.f90
        # initialise_ELRA_reference_load): the bed only deforms in
        # response to the load ANOMALY relative to the GIAeq geometry
        from ..core.ice.geometry import thickness_above_flotation
        Hi_eq, Hb_eq, SL_eq = _refgeo_GIAeq(C, region_name, mesh)
        Hi_eq_j = jnp.asarray(Hi_eq, dtype)
        Hb_eq_j = jnp.asarray(Hb_eq, dtype)
        SL_eq_j = jnp.asarray(SL_eq, dtype)
        TAF_eq = thickness_above_flotation(Hi_eq_j, Hb_eq_j, SL_eq_j)
        load_ref_m = surface_load(Hi_eq_j, Hb_eq_j, SL_eq_j, TAF_eq)

        def run(time, s, dt):
            load_m = surface_load(s.Hi, s.Hb + s.dHb, s.SL, s.TAF)
            load = (load_m - load_ref_m)[g2m].astype(fft_dtype)
            w_eq_hat = -grav * jnp.fft.rfft2(load) / denom
            w_eq = jnp.fft.irfft2(w_eq_hat, s=(nx, ny))
            dHb_eq_m = w_eq.ravel()[m2g].astype(s.dHb.dtype)
            # relaxation toward equilibrium
            dHb_dt = (dHb_eq_m - s.dHb) / tau
            dHb_new = s.dHb + dHb_dt * dt
            return dHb_dt, dHb_new
        return run

    raise NotImplementedError(f"choice_GIA_model '{choice}' not implemented")


def _refgeo_GIAeq(C, region_name, mesh):
    """GIA-equilibrium reference geometry on the mesh vertices
    (reference_geometries; falls back to the initial geometry when no
    GIAeq choice resolves, matching idealised test setups)."""
    import os
    choice = getattr(C, f"choice_refgeo_GIAeq_{region_name}",
                     "read_from_file")
    if choice == "idealised":
        from ..core.idealised_geometries import calc_idealised_geometry
        sub = getattr(C, "choice_refgeo_GIAeq_idealised", "") \
            or C.choice_refgeo_init_idealised
        Hi, Hb, _, SL = calc_idealised_geometry(
            mesh.V[:, 0], mesh.V[:, 1], sub, C)
        return np.where(Hi < C.refgeo_Hi_min, 0.0, Hi), Hb, SL
    fname = getattr(C, f"filename_refgeo_GIAeq_{region_name}", "")
    if fname and os.path.exists(fname):
        from ..io.input_files import read_geometry_onto_mesh
        return read_geometry_onto_mesh(C, region_name, mesh,
                                       which="GIAeq")
    # fall back to the initial geometry
    init_choice = getattr(C, f"choice_refgeo_init_{region_name}")
    if init_choice == "idealised":
        from ..core.idealised_geometries import calc_idealised_geometry
        Hi, Hb, _, SL = calc_idealised_geometry(
            mesh.V[:, 0], mesh.V[:, 1], C.choice_refgeo_init_idealised, C)
        return np.where(Hi < C.refgeo_Hi_min, 0.0, Hi), Hb, SL
    from ..io.input_files import read_geometry_onto_mesh
    return read_geometry_onto_mesh(C, region_name, mesh, which="init")
