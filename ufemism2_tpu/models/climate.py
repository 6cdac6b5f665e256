"""Climate models: monthly T2m, precipitation (+ insolation) on the mesh.

Re-design of src/UFEMISM/climate/ (climate_main.f90:191-206 dispatch):
choices none / idealised (EISMINT1 A-F, climate_idealised.f90:103-185) /
realistic snapshot (climate_realistic.f90) / snapshot_plus_uniform_deltaT /
snapshot_plus_transient_deltaT (+ lapse-rate geometry downscaling,
Clausius-Clapeyron precipitation corrections,
climate_model_utilities.f90:445-530).

TPU-first shape: snapshot fields and deltaT series are loaded onto the
device at init; the returned run(time, state) closures are jit-pure
(transient series interpolated with jnp.interp, insolation from the
preloaded InsolationForcing window), so climate always participates in
the fused per-event component dispatch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.constants import pi, T0


def _icefree_ocean_mask(s):
    """Cheap inline open-ocean mask (full mask logic lives in
    core/ice/masks.py; climate only needs 'is this open ocean')."""
    return (s.Hi <= 0.1) & (s.Hb + s.Hi * (910.0 / 1028.0) < s.SL)


def _downscale(T2m_snap, Precip_snap, Hs_snap, Hs_model, lapse_T,
               deltaT, icefree_ocean):
    """Lapse-rate + inversion-layer Clausius-Clapeyron downscaling
    (climate_model_utilities.f90 apply_geometry_downscaling_corrections,
    Albrecht et al. 2020 Eq. 11 / Jouzel & Merlivat 1984)."""
    dT_lapse = (Hs_model - Hs_snap) * (-jnp.abs(lapse_T))
    T2m = T2m_snap + deltaT + dT_lapse[:, None]
    T_inv_ref = 88.9 + 0.67 * T2m
    T_inv = 88.9 + 0.67 * (T2m - lapse_T * (Hs_model - Hs_snap)[:, None])
    Precip = Precip_snap * (T_inv_ref / T_inv) ** 2 \
        * jnp.exp(22.47 * (T0 / T_inv_ref - T0 / T_inv))
    keep = icefree_ocean[:, None]
    return (jnp.where(keep, T2m_snap + deltaT, T2m),
            jnp.where(keep, Precip_snap, Precip))


def _load_snapshot(C, mesh, fname, dtype):
    """(Hs, T2m, Precip) device arrays from a climate-snapshot file
    (climate_model_utilities.f90 read_climate_snapshot)."""
    from ..io.input_files import (read_field_from_file_2D,
                                  read_field_from_file_2D_monthly)
    Hs = read_field_from_file_2D(fname, "Hs", mesh)
    T2m = read_field_from_file_2D_monthly(fname, "T2m", mesh)
    Precip = read_field_from_file_2D_monthly(fname, "Precip", mesh)
    return (jnp.asarray(Hs, dtype), jnp.asarray(T2m, dtype),
            jnp.asarray(Precip, dtype))


def make_run_climate(C, md, region_name: str, mesh=None):
    """Returns run(time, state) -> dict(T2m [nV,12], Precip [nV,12],
    Q_TOA [nV,12] when an insolation source is configured)."""
    choice = getattr(C, f"choice_climate_model_{region_name}")
    nV = md.nV
    dtype = md.A.dtype

    if choice == "none":
        T2m = jnp.full((nV, 12), T0 - 20.0, dtype)
        Pr = jnp.zeros((nV, 12), dtype)
        return lambda time, s=None: {"T2m": T2m, "Precip": Pr}

    if choice == "idealised":
        return _make_run_idealised(C, md, region_name)

    if choice in ("realistic", "snapshot_plus_uniform_deltaT",
                  "snapshot_plus_transient_deltaT"):
        return _make_run_snapshot(C, md, region_name, mesh, choice)

    if choice == "snapshot_plus_anomalies":
        return _make_run_snapshot_plus_anomalies(C, md, region_name, mesh)

    if choice == "matrix":
        from .climate_matrix import make_run_climate_matrix
        return make_run_climate_matrix(C, md, region_name, mesh)

    raise ValueError(f"unknown choice_climate_model '{choice}'")


def _make_run_idealised(C, md, region_name):
    """EISMINT1 experiments A-F (Huybrechts et al. 1996;
    climate_idealised.f90:103-185)."""
    nV = md.nV
    dtype = md.A.dtype
    sub = C.choice_climate_model_idealised
    if not sub.startswith("EISMINT1_"):
        raise ValueError(f"unknown choice_climate_model_idealised '{sub}'")
    exp = sub[-1]
    host = getattr(md, "_host_mesh", None)
    V = host.V if host is not None else np.asarray(md.V)
    # fixed-margin distance from the divide: Chebyshev metric [km]
    d_km = jnp.asarray(np.maximum(np.abs(V[:, 0]), np.abs(V[:, 1])) / 1e3,
                       dtype)
    cycle = {"B": 20e3, "E": 20e3, "C": 40e3, "F": 40e3}.get(exp)

    def run(time, s=None):
        if exp in "ABC":
            # moving margin (Eq. 11): T = 270 - 0.01 Hs
            Hs = s.Hs if s is not None else jnp.zeros(nV, dtype)
            Ts = 270.0 - 0.01 * Hs
        else:
            # fixed margin (Eq. 9)
            Ts = 239.0 + 8.0e-8 * d_km ** 3
        if cycle is not None:
            Ts = Ts + jnp.where(time > 0.0,
                                10.0 * jnp.sin(2 * pi * time / cycle), 0.0)
        T2m = jnp.broadcast_to(Ts[:, None], (nV, 12))
        return {"T2m": T2m, "Precip": jnp.zeros((nV, 12), dtype)}
    return run


def _make_run_snapshot(C, md, region_name, mesh, choice):
    """Snapshot-based realistic climates (climate_realistic.f90,
    climate_snapshot_plus_{uniform,transient}_deltaT.f90)."""
    if mesh is None:
        raise ValueError(f"climate '{choice}' needs the host mesh for "
                         "file input")
    dtype = md.A.dtype

    if choice == "realistic":
        if C.choice_climate_model_realistic not in ("snapshot", ""):
            raise ValueError("unknown choice_climate_model_realistic "
                             f"'{C.choice_climate_model_realistic}'")
        fname = getattr(C, f"filename_climate_snapshot_{region_name}")
    elif choice == "snapshot_plus_uniform_deltaT":
        fname = getattr(C, f"filename_climate_snapshot_unif_dT_{region_name}")
        if not fname:
            fname = getattr(C, f"filename_climate_snapshot_{region_name}")
    else:
        fname = getattr(C,
                        f"filename_climate_snapshot_trans_dT_{region_name}")
        if not fname:
            fname = getattr(C, f"filename_climate_snapshot_{region_name}")

    Hs_snap, T2m_snap, Precip_snap = _load_snapshot(C, mesh, fname, dtype)

    do_lapse = getattr(C, f"do_lapse_rate_corrections_{region_name}")
    lapse_T = getattr(C, f"lapse_rate_temp_{region_name}")
    cc_corr = getattr(C, f"precip_CC_correction_{region_name}")

    # deltaT source
    if choice == "snapshot_plus_uniform_deltaT":
        deltaT_fn = (lambda t, v=getattr(C, f"uniform_deltaT_{region_name}"):
                     jnp.asarray(v, dtype))
    elif choice == "snapshot_plus_transient_deltaT":
        from ..io.input_files import read_series_from_file
        fname_dT = getattr(C, f"filename_atmosphere_dT_{region_name}")
        tt, dd = read_series_from_file(fname_dT, "dT_atmosphere")
        tt_j = jnp.asarray(tt, dtype)
        dd_j = jnp.asarray(dd, dtype)
        deltaT_fn = lambda t: jnp.interp(jnp.asarray(t, dtype), tt_j, dd_j)
    else:
        deltaT_fn = lambda t: jnp.asarray(0.0, dtype)

    # insolation (needed by IMAU-ITM)
    insol = None
    if getattr(C, f"choice_SMB_model_{region_name}") == "IMAU-ITM":
        if C.choice_insolation_forcing == "none":
            raise ValueError("IMAU-ITM requires choice_insolation_forcing "
                             "!= 'none'")
        from .insolation import InsolationForcing
        insol = InsolationForcing(C, mesh, dtype)

    apply_cc = choice == "snapshot_plus_transient_deltaT"

    def run(time, s=None):
        deltaT = deltaT_fn(time)
        if do_lapse and s is not None:
            T2m, Precip = _downscale(T2m_snap, Precip_snap, Hs_snap, s.Hs,
                                     lapse_T, deltaT,
                                     _icefree_ocean_mask(s))
        else:
            T2m = T2m_snap + deltaT
            Precip = Precip_snap
        if apply_cc:
            # Precip(dT) = Precip * cc^dT (apply_precipitation_CC_correction)
            Precip = Precip * cc_corr ** deltaT
        out = {"T2m": T2m, "Precip": Precip}
        if insol is not None:
            out["Q_TOA"] = insol.at_time(time)
        return out
    return run


def _make_run_snapshot_plus_anomalies(C, md, region_name, mesh):
    """Baseline snapshot + time-interpolated monthly T2m/Precip anomaly
    fields (climate_snapshot_plus_anomalies.f90:63-121; ISMIP6-style
    aST/aPr forcing). Anomaly series device-preloaded; run is jit-pure."""
    if mesh is None:
        raise ValueError("climate snapshot_plus_anomalies needs the host "
                         "mesh")
    import jax.numpy as jnp
    from ..io.input_files import load_timeframe_series
    dtype = md.A.dtype

    fname_snap = getattr(C, f"climate_snp_p_anml_filename_snapshot_"
                         f"{region_name}")
    Hs_snap, T2m_snap, Precip_snap = _load_snapshot(C, mesh, fname_snap,
                                                    dtype)
    fname_anml = getattr(C, f"climate_snp_p_anml_filename_anomalies_"
                         f"{region_name}")
    tt, dT = load_timeframe_series(fname_anml, "T2m_anomaly", mesh,
                                   reader="2D_monthly")
    _, dP = load_timeframe_series(fname_anml, "Precip_anomaly", mesh,
                                  reader="2D_monthly")
    tt_j = jnp.asarray(tt, dtype)
    dT_j = jnp.asarray(dT, dtype)
    dP_j = jnp.asarray(dP, dtype)

    def run(time, s=None):
        t = jnp.clip(jnp.asarray(time, dtype), tt_j[0], tt_j[-1])
        i = jnp.clip(jnp.searchsorted(tt_j, t) - 1, 0, len(tt) - 2)
        w = (t - tt_j[i]) / (tt_j[i + 1] - tt_j[i])
        T2m = T2m_snap + (1 - w) * dT_j[i] + w * dT_j[i + 1]
        Precip = jnp.maximum(
            0.0, Precip_snap + (1 - w) * dP_j[i] + w * dP_j[i + 1])
        return {"T2m": T2m, "Precip": Precip}
    return run
