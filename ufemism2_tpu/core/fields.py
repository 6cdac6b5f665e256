"""Fields framework: per-field metadata driving generic remap, restart
and output.

Re-design of src/UPSY/fields/ (fields_basic*.f90 type_field with grid
tag + third dimension, fields_registry.f90:98-158 create_field) and
src/UPSY/models/models_basic.f90 (atype_model with auto
allocate/remap/restart): here the model state is already a chex-dataclass
pytree, so the framework is a METADATA TABLE over those fields plus
generic walks that consult it - what makes remap-everything-on-mesh-update
and restart breadth tractable as the model grows (the same reason the
reference built it).

Each entry says where a field lives (entity grid + third dimension),
its units/long_name (for NetCDF output), and how it transfers to a new
mesh: 'conservative' (2nd-order conservative remap), 'trilin' (linear
interpolation), 'reinit' (recomputed from other fields - masks,
effective quantities, velocities that the next solve regenerates),
'copy' (mesh-independent scalars).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FieldMeta:
    grid: str            # 'a' (vertices) | 'b' (triangles) | '0' (scalar)
    third: str = ""      # '' | 'zeta' | 'month'
    units: str = "-"
    long_name: str = ""
    remap: str = "reinit"


F = FieldMeta

# IceState (core/ice/state.py) field metadata; reference equivalents:
# ice_model_types.f90:297-533 + the per-component remap_* routines.
ICE_FIELD_META = {
    # geometry
    "Hi": F("a", "", "m", "ice thickness", "conservative"),
    "Hb": F("a", "", "m", "bedrock elevation", "conservative"),
    "SL": F("a", "", "m", "sea level", "trilin"),
    "Hs": F("a", "", "m", "surface elevation", "reinit"),
    "Hib": F("a", "", "m", "ice base elevation", "reinit"),
    "TAF": F("a", "", "m", "thickness above flotation", "reinit"),
    "dHb": F("a", "", "m", "bedrock deformation", "trilin"),
    # rates
    "dHi_dt": F("a", "", "m yr^-1", "thickness rate of change", "trilin"),
    "divQ": F("a", "", "m yr^-1", "ice flux divergence", "reinit"),
    "dHi_dt_target": F("a", "", "m yr^-1", "inversion target thinning "
                       "rate", "trilin"),
    # prediction window
    "t_Hi_prev": F("0", "", "yr", "window start", "copy"),
    "t_Hi_next": F("0", "", "yr", "window end", "copy"),
    "Hi_prev": F("a", "", "m", "Hi at window start", "conservative"),
    "Hi_next": F("a", "", "m", "Hi at window end", "conservative"),
    # masks (recomputed from geometry)
    **{m: F("a", "", "-", m.replace("_", " "), "reinit")
       for m in ("mask_noice", "mask_icefree_land", "mask_icefree_ocean",
                 "mask_grounded_ice", "mask_floating_ice", "mask_margin",
                 "mask_gl_gr", "mask_gl_fl", "mask_cf_gr", "mask_cf_fl",
                 "mask_coastline", "mask")},
    "fraction_margin": F("a", "", "-", "margin ice fraction", "reinit"),
    "fraction_gr": F("a", "", "-", "grounded fraction", "reinit"),
    "fraction_gr_b": F("b", "", "-", "grounded fraction (b)", "reinit"),
    "Hi_eff": F("a", "", "m", "effective thickness", "reinit"),
    "A_flow": F("a", "zeta", "Pa^-3 yr^-1", "Glen flow factor", "reinit"),
    "bed_roughness": F("a", "", "-", "bed roughness (nudgable)", "trilin"),
    # velocities (re-solved on the new mesh; carried as warm start)
    "u_vav_b": F("b", "", "m yr^-1", "vertically averaged x-velocity",
                 "trilin"),
    "v_vav_b": F("b", "", "m yr^-1", "vertically averaged y-velocity",
                 "trilin"),
    "u_3D_b": F("b", "zeta", "m yr^-1", "3-D x-velocity", "trilin"),
    "v_3D_b": F("b", "zeta", "m yr^-1", "3-D y-velocity", "trilin"),
    # stress-balance warm-start state (reference: persistent DIVA solver
    # fields, written to its restart files by create_restart_file_DIVA)
    "visc_tau_bx": F("b", "", "Pa", "basal shear stress x (warm start)",
                     "trilin"),
    "visc_tau_by": F("b", "", "Pa", "basal shear stress y (warm start)",
                     "trilin"),
    "visc_eta_3D_b": F("b", "zeta", "Pa yr", "effective viscosity "
                       "(warm start)", "trilin"),
    # thermodynamics
    "Ti": F("a", "zeta", "K", "englacial temperature", "conservative"),
    # counters / controller scalars
    "dt_ice": F("0", "", "yr", "last ice time step", "copy"),
    "n_visc_its": F("0", "", "-", "viscosity iterations", "copy"),
    "n_Axb_its": F("0", "", "-", "linear-solver iterations", "copy"),
    # pc controller (predictor_corrector_scheme.f90:417-444)
    "pc.dt_n": F("0", "", "yr", "pc previous dt", "copy"),
    "pc.dt_np1": F("0", "", "yr", "pc current dt", "copy"),
    "pc.eta_n": F("0", "", "-", "pc previous truncation error", "copy"),
    "pc.eta_np1": F("0", "", "-", "pc current truncation error", "copy"),
    "pc.dHi_dt_Hi_nm1_u_nm1": F("a", "", "m yr^-1",
                                "pc previous thinning rate",
                                "conservative"),
    "pc.tau_np1": F("a", "", "m yr^-1", "pc truncation error field",
                    "trilin"),
}


def field_meta(name: str) -> FieldMeta:
    return ICE_FIELD_META.get(name, FieldMeta("a"))


def remap_ice_state(old_state, new_state, M_cons, M_trilin):
    """Transfer every IceState field onto a new mesh according to its
    metadata (the reference's remap-everything walk,
    UFEMISM_main_model.f90:1311-1323). `new_state` must be a freshly
    initialised state on the new mesh (its 'reinit' fields are kept).

    M_cons / M_trilin: scipy operators [nV_new, nV_old] (a-grid) and the
    b-grid variants as a (M_a, M_b) tuple each."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp

    M_cons_a, M_cons_b = M_cons
    M_tri_a, M_tri_b = M_trilin

    def move(meta, old_v, new_v):
        if meta.remap == "copy":
            return old_v
        if meta.remap == "reinit":
            return new_v
        M = {("conservative", "a"): M_cons_a,
             ("conservative", "b"): M_cons_b,
             ("trilin", "a"): M_tri_a,
             ("trilin", "b"): M_tri_b}[(meta.remap, meta.grid)]
        arr = np.asarray(old_v)
        was_bool = arr.dtype == bool
        if was_bool:
            arr = arr.astype(np.float64)
        out = M @ arr
        if was_bool:
            out = out > 0.5
        return jnp.asarray(out, new_v.dtype).reshape(new_v.shape)

    updates = {}
    for f in dataclasses.fields(old_state):
        old_v = getattr(old_state, f.name)
        new_v = getattr(new_state, f.name)
        if dataclasses.is_dataclass(old_v):
            sub = {}
            for g in dataclasses.fields(old_v):
                meta = field_meta(f"{f.name}.{g.name}")
                sub[g.name] = move(meta, getattr(old_v, g.name),
                                   getattr(new_v, g.name))
            updates[f.name] = new_v.replace(**sub)
        else:
            updates[f.name] = move(field_meta(f.name), old_v, new_v)
    return new_state.replace(**updates)
