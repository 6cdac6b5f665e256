"""Ocean models: 3-D T/S fields and ice-draft properties.

Re-design of src/UFEMISM/ocean/ (ocean_main.f90:92-106 dispatch): choices
none / idealised / realistic (snapshot, snapshot_plus_uniform_deltaT,
transient deltaT) / GlacialIndex, with cavity extrapolation of the forcing
fields (ocean_extrapolation.f90:15-222). Vertical axis: ocean depth grid
(0 .. ocean_vertical_grid_max_depth, spacing dz,
ocean_utilities.f90:219-245).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .bmb import ocean_freezing_point_at_draft


def ocean_depth_axis(C):
    return np.arange(0.0, C.ocean_vertical_grid_max_depth + 1e-9,
                     C.ocean_vertical_grid_dz)


# ---------------------------------------------------------------------------
# Cavity extrapolation (ocean_extrapolation.f90)
# ---------------------------------------------------------------------------

def _gaussian_fill_2d(mesh, d, fillable):
    """Iterative neighbour-average fill of NaN entries flagged fillable
    [nV, nz] (the reference's extrapolate_Gaussian applied per layer;
    host-side numpy at initialisation time)."""
    C = mesh.C
    mask_C = C >= 0
    Cs = np.maximum(C, 0)
    d = d.copy()
    for _ in range(64):
        isnan = np.isnan(d)
        todo = isnan & fillable
        if not todo.any():
            break
        nb = d[Cs]                               # [nV, nC_mem, nz]
        valid = (~np.isnan(nb)) & mask_C[:, :, None]
        nbsum = np.where(valid, np.nan_to_num(nb), 0.0).sum(axis=1)
        nbcnt = valid.sum(axis=1)
        avg = nbsum / np.maximum(nbcnt, 1)
        new = todo & (nbcnt > 0)
        d[new] = avg[new]
    return d


def extrapolate_ocean_forcing(mesh, Hi, Hb, SL, z_ocean, d):
    """Fill the 3-D ocean field into cavities, ice and bedrock
    (ocean_extrapolation.f90 extrapolate_ocean_forcing:15-49):
    0. NaN below bedrock; 1. horizontal fill inside cavities;
    2. vertical fill up into the shelf and down into bedrock;
    3. horizontal fill everywhere else."""
    d = np.array(d, dtype=np.float64)
    z = np.asarray(z_ocean)
    # ice draft elevation: floating draft, clamped to the bed when grounded
    Hib = np.maximum(np.asarray(SL) - np.asarray(Hi) * 910.0 / 1028.0,
                     np.asarray(Hb))
    Hb = np.asarray(Hb)

    # step 0: below bedrock -> NaN
    below_bed = z[None, :] > -Hb[:, None]
    d[below_bed] = np.nan

    # step 1: horizontal fill inside cavities only
    in_cavity = (z[None, :] > -Hib[:, None]) & (z[None, :] < -Hb[:, None])
    d = _gaussian_fill_2d(mesh, d, in_cavity)

    # step 2: vertical fill (top: first non-NaN upward; bottom: downward)
    for vi in range(d.shape[0]):
        col = d[vi]
        good = np.flatnonzero(~np.isnan(col))
        if len(good) == 0:
            continue
        col[:good[0]] = col[good[0]]
        col[good[-1]:] = col[good[-1]]
        # interior gaps: linear interpolation between bracketing values
        bad = np.isnan(col)
        if bad.any():
            col[bad] = np.interp(z[bad], z[~bad], col[~bad])
        d[vi] = col

    # step 3: horizontal fill everywhere
    d = _gaussian_fill_2d(mesh, d, np.ones_like(d, dtype=bool))
    return np.nan_to_num(d, nan=0.0)


# ---------------------------------------------------------------------------
# Model factory
# ---------------------------------------------------------------------------

def make_run_ocean(C, md, region_name: str, mesh=None):
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
        Tprof = Sprof = None
        if sub in ("MISMIPplus_WARM", "MISMIPplus_COLD"):
            # ISOMIP+ WARM/COLD profiles (Asay-Davis et al. 2016, Table 4)
            T_top, T_bot = (-1.9, 1.0) if sub.endswith("WARM") else (-1.9, -1.9)
            S_top, S_bot = 33.8, 34.7
            zd = 720.0
            frac = jnp.clip(depths / zd, 0.0, 1.0)
            Tprof = T_top + (T_bot - T_top) * frac
            Sprof = S_top + (S_bot - S_top) * frac
        elif sub == "ISOMIP":
            # scenario-parameterised linear ramp over z1=720 m, NOT
            # clipped below z1 (ocean_idealised.f90:114-148)
            scen = C.choice_ocean_isomip_scenario
            if scen == "WARM":
                T1, S1 = 1.0, 34.7
            elif scen == "COLD":
                T1, S1 = -1.9, 34.55
            else:
                raise ValueError(
                    f"unknown choice_ocean_isomip_scenario '{scen}'")
            T0, S0, z1 = -1.9, 33.8, 720.0
            Tprof = T0 + (T1 - T0) * depths / z1
            Sprof = S0 + (S1 - S0) * depths / z1
        elif sub == "TANH":
            # two-layer forcing with tanh thermocline + quadratic-density
            # salinity via the linear EOS (ocean_idealised.f90:150-188)
            from ..utils.constants import (freezing_lambda_1,
                                           freezing_lambda_2,
                                           seawater_density)
            S0 = 34.0
            Tsurf = freezing_lambda_1 * S0 + freezing_lambda_2
            drho0 = 0.01
            Tprof = Tsurf + (C.ocean_tanh_deep_temperature - Tsurf) * (
                1 + jnp.tanh((depths - C.ocean_tanh_thermocline_depth)
                             / C.ocean_tanh_thermocline_scale_depth)) / 2
            Sprof = (S0
                     + C.uniform_laddie_eos_linear_alpha
                     * (Tprof - Tsurf) / C.uniform_laddie_eos_linear_beta
                     + drho0 * jnp.sqrt(depths)
                     / (C.uniform_laddie_eos_linear_beta * seawater_density))
        elif sub == "LINEAR":
            # linear ramp from the surface freezing point
            # (ocean_idealised.f90:190-227)
            from ..utils.constants import (freezing_lambda_1,
                                           freezing_lambda_2)
            S0 = 34.5
            Tsurf = freezing_lambda_1 * S0 + freezing_lambda_2
            zr = C.ocean_linear_reference_depth
            Tprof = Tsurf + (C.ocean_linear_deep_temperature - Tsurf) \
                * depths / zr
            Sprof = S0 + (C.ocean_linear_deep_salinity - S0) * depths / zr
        elif sub == "LINEAR_THERMOCLINE":
            # two layers joined by a linear thermocline (de Rydt 2014;
            # ocean_idealised.f90:229-284)
            zt = C.ocean_lin_therm_thermocline_top
            zb = C.ocean_lin_therm_thermocline_bottom
            T0, T1 = (C.ocean_lin_therm_surf_temperature,
                      C.ocean_lin_therm_deep_temperature)
            S0, S1 = (C.ocean_lin_therm_surf_salinity,
                      C.ocean_lin_therm_deep_salinity)
            w = jnp.clip((depths - zt) / (zb - zt), 0.0, 1.0)
            Tprof = T0 + (T1 - T0) * w
            Sprof = S0 + (S1 - S0) * w
        if Tprof is not None:
            Tf = jnp.broadcast_to(Tprof[None, :], (nV, nd)).astype(dtype)
            Sf = jnp.broadcast_to(Sprof[None, :], (nV, nd)).astype(dtype)
            return lambda time, s: _draft_properties(Tf, Sf, s)
        raise ValueError(f"unknown choice_ocean_model_idealised '{sub}'")

    if choice in ("realistic", "snapshot_plus_uniform_deltaT",
                  "GlacialIndex", "deltaT_transient"):
        return _make_run_realistic(C, md, region_name, mesh, choice,
                                   depths, _draft_properties)

    if choice == "snapshot+nudge2D":
        return _OceanNudge2D(C, md, region_name, mesh, depths,
                             _draft_properties)

    if choice == "snapshot_plus_anomalies":
        # baseline snapshot + time-interpolated 3-D T/S anomalies
        # (ocean_snapshot_plus_anomalies.f90:22-70); the anomaly series
        # is preloaded onto the device, interpolation is pure jnp
        if mesh is None:
            raise ValueError("ocean snapshot_plus_anomalies needs the "
                             "host mesh")
        from ..io.input_files import load_timeframe_series
        z_ocean = np.asarray(depths)
        md._region_name = region_name
        T0f, S0f = _load_snapshot_TS(
            C, mesh, md, C.ocean_snp_p_anml_filename_snapshot, z_ocean,
            dtype)
        fname = C.ocean_snp_p_anml_filename_anomalies
        tt, dT = load_timeframe_series(fname, "temperature_anomaly", mesh,
                                       reader="3D_ocean", z_ocean=z_ocean)
        _, dS = load_timeframe_series(fname, "salinity_anomaly", mesh,
                                      reader="3D_ocean", z_ocean=z_ocean)
        tt_j = jnp.asarray(tt, dtype)
        dT_j = jnp.asarray(dT, dtype)
        dS_j = jnp.asarray(dS, dtype)

        def run(time, s):
            t = jnp.clip(jnp.asarray(time, dtype), tt_j[0], tt_j[-1])
            i = jnp.clip(jnp.searchsorted(tt_j, t) - 1, 0, len(tt) - 2)
            w = (t - tt_j[i]) / (tt_j[i + 1] - tt_j[i])
            Tf = T0f + (1 - w) * dT_j[i] + w * dT_j[i + 1]
            Sf = S0f + (1 - w) * dS_j[i] + w * dS_j[i + 1]
            return _draft_properties(Tf, Sf, s)
        return run

    raise ValueError(f"unknown choice_ocean_model '{choice}'")


def _load_snapshot_TS(C, mesh, md, fname, z_ocean, dtype,
                      extrapolate=True):
    """Read + cavity-extrapolate a T/S ocean snapshot
    (ocean_realistic.f90 initialise_ocean_model_snapshot:176-226)."""
    from ..io.input_files import read_field_from_file_3D_ocean
    T = read_field_from_file_3D_ocean(fname, "T_ocean", mesh, z_ocean)
    S = read_field_from_file_3D_ocean(fname, "S_ocean", mesh, z_ocean)
    if extrapolate and C.choice_ocean_extrapolation_method \
            == "initialisation":
        region = getattr(md, "_region_name", "ANT")
        Hi, Hb, SL = _init_geometry_for_extrap(C, region, mesh)
        T = extrapolate_ocean_forcing(mesh, Hi, Hb, SL, z_ocean, T)
        S = extrapolate_ocean_forcing(mesh, Hi, Hb, SL, z_ocean, S)
    return jnp.asarray(T, dtype), jnp.asarray(S, dtype)


def _init_geometry_for_extrap(C, region, mesh):
    """Initial-geometry Hi/Hb/SL on the mesh (used to define cavities for
    the extrapolation step)."""
    choice = getattr(C, f"choice_refgeo_init_{region}")
    if choice == "read_from_file":
        from ..io.input_files import read_geometry_onto_mesh
        return read_geometry_onto_mesh(C, region, mesh, which="init")
    from ..core.idealised_geometries import calc_idealised_geometry
    Hi, Hb, Hs, SL = calc_idealised_geometry(
        mesh.V[:, 0], mesh.V[:, 1], C.choice_refgeo_init_idealised, C)
    return Hi, Hb, SL


def _make_run_realistic(C, md, region_name, mesh, choice, depths,
                        _draft_properties):
    if mesh is None:
        raise ValueError(f"ocean '{choice}' needs the host mesh for file "
                         "input")
    dtype = md.A.dtype
    z_ocean = np.asarray(depths)
    md._region_name = region_name

    if choice == "realistic" and C.choice_ocean_model_realistic not in (
            "snapshot", "snapshot_plus_uniform_deltaT", "transient", ""):
        raise ValueError("unknown choice_ocean_model_realistic "
                         f"'{C.choice_ocean_model_realistic}'")

    fname = getattr(C, f"filename_ocean_snapshot_{region_name}")
    T0f, S0f = _load_snapshot_TS(C, mesh, md, fname, z_ocean, dtype)

    if choice in ("realistic", "snapshot_plus_uniform_deltaT") and \
            C.choice_ocean_model_realistic != "transient":
        dT = getattr(C, f"ocean_uniform_deltaT_{region_name}") \
            if (choice == "snapshot_plus_uniform_deltaT"
                or C.choice_ocean_model_realistic
                == "snapshot_plus_uniform_deltaT") else 0.0
        Tf = T0f + dT
        return lambda time, s: _draft_properties(Tf, S0f, s)

    if choice == "deltaT_transient" or (
            choice == "realistic"
            and C.choice_ocean_model_realistic == "transient"):
        # snapshot + spatially-uniform transient dT(t) from a series file
        # (ocean_deltaT_transient.f90)
        from ..io.input_files import read_series_from_file
        fname_dT = getattr(C, f"filename_ocean_dT_{region_name}")
        tt, dd = read_series_from_file(fname_dT, "dT_ocean")
        tt_j = jnp.asarray(tt, dtype)
        dd_j = jnp.asarray(dd, dtype)

        def run(time, s):
            dT = jnp.interp(jnp.asarray(time, dtype), tt_j, dd_j)
            return _draft_properties(T0f + dT, S0f, s)
        return run

    # GlacialIndex: interpolate warm/cold snapshots by GI(t)
    # (ocean_GlacialIndex.f90)
    from ..io.input_files import read_series_from_file
    fname_w = getattr(C, f"filename_ocean_warm_snapshot_{region_name}",
                      "") or fname
    fname_c = getattr(C, f"filename_ocean_cold_snapshot_{region_name}",
                      "") or fname
    Tw, Sw = _load_snapshot_TS(C, mesh, md, fname_w, z_ocean, dtype)
    Tc, Sc = _load_snapshot_TS(C, mesh, md, fname_c, z_ocean, dtype)
    fname_gi = getattr(C, "filename_glacial_index", "")
    tt, gg = read_series_from_file(fname_gi, "GI")
    tt_j = jnp.asarray(tt, dtype)
    gg_j = jnp.asarray(gg, dtype)

    def run(time, s):
        GI = jnp.interp(jnp.asarray(time, dtype), tt_j, gg_j)
        return _draft_properties(Tw * (1 - GI) + Tc * GI,
                                 Sw * (1 - GI) + Sc * GI, s)
    return run


class _OceanNudge2D:
    """snapshot+nudge2D: nudge a 2-D ocean temperature offset deltaT(x,y)
    so the modelled shelf thickness tracks the target geometry
    (ocean_snapshot_nudge2D.f90: dT/dt = c_H dH + c_dHdt dH/dt on fully
    floating non-margin shelf vertices, extrapolated outward, clipped to
    +-2 K, added to the snapshot T). Stateful (deltaT carried between
    calls at the dt_ocean cadence)."""

    C_H = 1e-5
    C_DHDT = 3e-4
    DT_MAX = 2.0

    def __init__(self, C, md, region_name, mesh, depths, draft_props):
        if mesh is None:
            raise ValueError("ocean snapshot+nudge2D needs the host mesh")
        self.C, self.md = C, md
        self._draft = draft_props
        dtype = md.A.dtype
        z_ocean = np.asarray(depths)
        md._region_name = region_name
        fname = getattr(C, f"filename_ocean_snapshot_{region_name}")
        self.T0, self.S0 = _load_snapshot_TS(C, mesh, md, fname, z_ocean,
                                             dtype)
        # target thickness: the PD reference geometry
        try:
            Hi_t, _, _ = _init_geometry_for_extrap(C, region_name, mesh)
        except Exception:
            from ..io.input_files import read_geometry_onto_mesh
            Hi_t, _, _ = read_geometry_onto_mesh(C, region_name, mesh,
                                                 which="PD")
        self.Hi_target = jnp.asarray(Hi_t, dtype)
        self.deltaT = jnp.zeros(md.nV, dtype)
        self._t_prev = None
        self.t_start = C.BMB_inversion_t_start
        self.t_end = C.BMB_inversion_t_end

    def carry_state_from(self, old, remap):
        """Transfer the nudged deltaT inversion state across a mesh
        update instead of resetting it to zero."""
        self.deltaT = jnp.clip(remap(old.deltaT), -self.DT_MAX,
                               self.DT_MAX)
        self._t_prev = old._t_prev

    def __call__(self, time, s):
        t = float(time) if not hasattr(time, "aval") else None
        # nudging only inside the inversion window; outside, apply the
        # frozen deltaT (host-side state update like the BMB inversion)
        if t is not None and self.t_start <= t <= self.t_end:
            from .bed_roughness import gaussian_extrapolate
            dt = (t - self._t_prev) if self._t_prev is not None \
                else self.C.dt_ocean
            self._t_prev = t
            fully_floating = (s.Hi > 0.1) & (self.md.M_map_b_a
                                             @ s.fraction_gr_b < 0.01)
            seed = fully_floating & ~s.mask_margin
            dTdt = jnp.where(seed,
                             self.C_H * (s.Hi - self.Hi_target)
                             + self.C_DHDT * s.dHi_dt, 0.0)
            dT = jnp.clip(self.deltaT + dt * dTdt,
                          -self.DT_MAX, self.DT_MAX)
            fill = ~seed
            dT = gaussian_extrapolate(self.md, seed, fill, dT)
            self.deltaT = jnp.clip(dT, -self.DT_MAX, self.DT_MAX)
        return self._draft(self.T0 + self.deltaT[:, None], self.S0, s)
