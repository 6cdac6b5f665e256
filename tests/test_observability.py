"""Observability wiring: checksum logging from the model loop, global
sea-level forcing plumbed into regions, and the transitional-flux scalars
(gl_flux etc.) in the scalar output."""

import numpy as np
import pytest

from ufemism2_tpu.config import Config


def _halfar_config(**over):
    base = dict(
        choice_refgeo_init_ANT="idealised",
        choice_refgeo_init_idealised="Halfar",
        dx_refgeo_init_idealised=50e3,
        refgeo_idealised_Halfar_H0=3000.0,
        refgeo_idealised_Halfar_R0=500e3,
        uniform_Glens_flow_factor=1e-16,
        choice_ice_rheology_Glen="uniform",
        choice_stress_balance_approximation="SIA",
        choice_sliding_law="no_sliding",
        xmin_ANT=-750e3, xmax_ANT=750e3, ymin_ANT=-750e3, ymax_ANT=750e3,
        maximum_resolution_uniform=150e3,
        maximum_resolution_grounded_ice=150e3,
        maximum_resolution_ice_front=100e3,
        ice_front_width=100e3,
        start_time_of_run=0.0, end_time_of_run=20.0,
        nit_Lloyds_algorithm=2,
        refgeo_Hi_min=2.0,
    )
    base.update(over)
    return Config(**base)


def test_checksum_log_wired(tmp_path):
    """do_write_checksum_log=True produces checksum entries for the hot
    ice fields during a run (the reference's parity oracle,
    ice_dynamics_main.f90:153-162)."""
    from ufemism2_tpu.main.region import ModelRegion
    C = _halfar_config(do_write_checksum_log=True)
    r = ModelRegion(C, "ANT", output_dir=str(tmp_path / "out"))
    r.run_to(10.0)
    assert len(r.checksum.entries) > 0
    names = {e["name"] for e in r.checksum.entries}
    assert "ice.Hi" in names and "ice.u_vav_b" in names
    log = tmp_path / "out" / "checksum_log_ANT.jsonl"
    assert log.exists() and log.stat().st_size > 0
    r.checksum.close()

    # identical runs produce identical logs (bitwise-drift detection)
    r2 = ModelRegion(C, "ANT", mesh=r.mesh,
                     output_dir=str(tmp_path / "out2"))
    r2.run_to(10.0)
    r2.checksum.close()
    from ufemism2_tpu.utils.checksum import compare_checksum_logs
    mism = compare_checksum_logs(log, tmp_path / "out2"
                                 / "checksum_log_ANT.jsonl")
    assert mism == []


def test_sealevel_forcing_moves_state():
    from ufemism2_tpu.main.region import ModelRegion
    C = _halfar_config()
    r = ModelRegion(C, "ANT")
    r.set_sealevel(-120.0)
    assert np.allclose(np.asarray(r.state.SL), -120.0)


def test_flux_scalars_in_output(tmp_path):
    """Scalar output carries the transitional fluxes; the Halfar dome is
    land-terminating so the margin_land flux is negative (outflow) and
    the gl/cf fluxes are ~zero."""
    from ufemism2_tpu.main.region import ModelRegion
    C = _halfar_config()
    r = ModelRegion(C, "ANT", output_dir=str(tmp_path / "out"))
    r.run_to(20.0)
    r.write_output()
    scal = r.scalars_history[-1]
    for key in ("gl_flux", "cf_gr_flux", "cf_fl_flux",
                "margin_land_flux", "margin_ocean_flux", "dV_dt",
                "SMB_gr", "BMB_fl"):
        assert key in scal, key
    assert scal["margin_land_flux"] <= 0.0
    assert abs(scal["gl_flux"]) < 1e-6
    # SMB on the Halfar dome is zero everywhere
    assert scal["SMB_total"] == pytest.approx(0.0, abs=1e-9)


def test_nan_sanitizer_flags_poisoned_state():
    """do_check_for_NaN equivalent: the sanitizer must name exactly the
    poisoned IceState fields (SURVEY 5.2; reference crash('NaN in ...'))."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from ufemism2_tpu.utils.sanitizer import (check_state_for_nan,
                                              NaNDetected)
    from ufemism2_tpu.core.ice.state import init_ice_state
    from ufemism2_tpu.core.mesh_data import build_mesh_data
    from ufemism2_tpu.mesh.creation import build_uniform_mesh

    mesh = build_uniform_mesh(0, 100e3, 0, 100e3, 25e3)
    md = build_mesh_data(mesh)
    nV = mesh.nV
    s = init_ice_state(md, np.full(nV, 100.0), np.zeros(nV), np.zeros(nV),
                       nz=md.nz)
    check_state_for_nan(s)    # clean state passes

    s_bad = s.replace(Hi=s.Hi.at[0].set(jnp.nan),
                      u_vav_b=s.u_vav_b.at[3].set(jnp.inf))
    with pytest.raises(NaNDetected) as e:
        check_state_for_nan(s_bad, where="unit test")
    msg = str(e.value)
    assert "Hi" in msg and "u_vav_b" in msg and "unit test" in msg
