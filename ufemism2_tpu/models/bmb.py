"""Basal mass balance (sub-shelf melt) models.

Re-design of src/UFEMISM/basal_mass_balance/ (BMB_main.f90 dispatch +
Leguy et al. 2021 sub-grid schemes): choices uniform / idealised /
parameterised (Favier2019 quadratic, Holland) / inverted / laddie.
Sign convention: positive BMB = accumulation (refreezing), negative = melt.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.constants import (seawater_density, ice_density, cp_ocean,
                               L_fusion, freezing_lambda_1, freezing_lambda_2,
                               freezing_lambda_3, sec_per_year)


def apply_bmb_subgrid_scheme(C, masks, fraction_gr, BMB_shelf):
    """FCMP / PMP / NMP grounding-line melt schemes (BMB_main.f90:721)."""
    if C.do_subgrid_BMB_at_grounding_line:
        if C.choice_BMB_subgrid == "FCMP":
            return jnp.where(masks["mask_floating_ice"], BMB_shelf, 0.0)
        if C.choice_BMB_subgrid == "PMP":
            gl = masks["mask_floating_ice"] | masks["mask_gl_gr"]
            return jnp.where(gl, (1.0 - fraction_gr) * BMB_shelf, 0.0)
        raise ValueError(f"unknown choice_BMB_subgrid "
                         f"'{C.choice_BMB_subgrid}'")
    # NMP
    return jnp.where(fraction_gr == 0.0, BMB_shelf, 0.0)


def make_run_bmb(C, md, region_name: str, target_geometry=None):
    """Returns run(time, state, masks, fraction_gr, ocean) -> BMB [m/yr].

    target_geometry: optional zero-arg callable -> (Hi_target [nV],
    mask_shelf_target [nV]) used by the 'inverted' choice; late-bound so
    a gate/run can swap the target after region construction (the
    reference reads it from filename_refgeo_PD, BMB_inverted.f90:70-96)."""
    choice = getattr(C, f"choice_BMB_model_{region_name}")
    nV = md.nV
    dtype = md.A.dtype

    def _finalise(C, masks, fraction_gr, BMB_shelf):
        bmb = apply_bmb_subgrid_scheme(C, masks, fraction_gr, BMB_shelf)
        return jnp.clip(bmb, -C.BMB_maximum_allowed_melt_rate,
                        C.BMB_maximum_allowed_refreezing_rate)

    if choice == "uniform":
        def run(time, s, masks, fraction_gr, ocean=None):
            shelf = jnp.full(nV, C.uniform_BMB, dtype)
            return _finalise(C, masks, fraction_gr, shelf)
        return run

    if choice in ("prescribed", "prescribed_fixed"):
        # time-constant sub-shelf melt field read from a file
        # (BMB_prescribed.f90; 'prescribed_fixed' keeps it frozen on the
        # initial mesh - identical here since fields remap on mesh update)
        mesh = getattr(md, "_host_mesh", None)
        fname = getattr(C, f"filename_BMB_prescribed_{region_name}")
        if mesh is None or not fname:
            raise ValueError("prescribed BMB needs filename_BMB_prescribed"
                             f"_{region_name} and the host mesh")
        from ..io.input_files import read_field_from_file_2D
        val = jnp.asarray(read_field_from_file_2D(fname, "BMB", mesh),
                          dtype)

        def run(time, s, masks, fraction_gr, ocean=None):
            return _finalise(C, masks, fraction_gr, val)
        return run

    if choice == "idealised":
        sub = C.choice_BMB_model_idealised
        if sub in ("", "uniform"):
            def run(time, s, masks, fraction_gr, ocean=None):
                shelf = jnp.full(nV, C.uniform_BMB, dtype)
                return _finalise(C, masks, fraction_gr, shelf)
            return run
        if sub in ("MISMIPplus", "MISMIP+"):   # both accepted, BMB_idealised.f90:46-48
            # Asay-Davis et al. (2016) ice1r melt parameterisation
            def run(time, s, masks, fraction_gr, ocean=None):
                draft = s.Hib
                z0 = -100.0
                cavity = jnp.maximum(0.0, draft - s.Hb)   # BMB_idealised.f90:81
                melt = 0.2 * jnp.tanh(cavity / 75.0) \
                    * jnp.maximum(0.0, z0 - draft)
                return _finalise(C, masks, fraction_gr, -melt)
            return run
        raise ValueError(f"unknown choice_BMB_model_idealised '{sub}'")

    if choice == "parameterised":
        sub = C.choice_BMB_model_parameterised
        if sub == "Favier2019":
            # Favier et al. (2019) quadratic local melt parameterisation
            gamma = C.BMB_Favier2019_gamma
            coef = (seawater_density * cp_ocean
                    / (ice_density * L_fusion)) ** 2

            def run(time, s, masks, fraction_gr, ocean=None):
                if ocean is None:
                    raise ValueError("Favier2019 BMB needs an ocean model")
                dT = jnp.maximum(0.0, ocean["T_draft"]
                                 - ocean["T_freezing_point"])
                melt = gamma * sec_per_year * coef * dT ** 2  # [m/yr]
                return _finalise(C, masks, fraction_gr, -melt)
            return run
        raise NotImplementedError(
            f"choice_BMB_model_parameterised '{sub}' not implemented")

    if choice == "inverted":
        import jax.numpy as _jnp
        from .bed_roughness import make_run_bmb_inverted
        inv = make_run_bmb_inverted(C, md)
        cache = {"BMB": None}

        def run(time, s, masks, fraction_gr, ocean=None):
            if cache["BMB"] is None:
                cache["BMB"] = _jnp.zeros(nV, dtype)
            if target_geometry is not None:
                Hi_t, tgt_shelf = target_geometry()
            else:
                # no target available: fall back to the current state
                # (inversion becomes a pure dHi_dt damper)
                Hi_t, tgt_shelf = s.Hi, masks["mask_floating_ice"]
            cache["BMB"] = inv(cache["BMB"], s, masks, Hi_t, tgt_shelf,
                               time)
            return cache["BMB"]
        return run

    if choice == "laddie":
        from .laddie import make_run_bmb_laddie
        return make_run_bmb_laddie(C, md, region_name)

    raise NotImplementedError(f"choice_BMB_model '{choice}' not implemented")


def ocean_freezing_point_at_draft(S_draft, draft):
    """Local freezing point [deg C] (parameters.f90 freezing_lambda_*)."""
    return (freezing_lambda_1 * S_draft + freezing_lambda_2
            + freezing_lambda_3 * draft)
