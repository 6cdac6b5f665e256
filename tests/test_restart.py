"""Checkpoint/resume: restart-file round trip restoring the full IceState
(incl. the pc controller, predictor_corrector_scheme.f90:417-444) and the
interrupted-vs-uninterrupted equivalence the reference's restart system
guarantees."""

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
        start_time_of_run=0.0, end_time_of_run=100.0,
        nit_Lloyds_algorithm=2,
        refgeo_Hi_min=2.0,
    )
    base.update(over)
    return Config(**base)


def test_restart_roundtrip_state(tmp_path):
    """write -> load restores every field bit-exactly, incl. pc state."""
    from ufemism2_tpu.main.region import ModelRegion
    from ufemism2_tpu.io.output_files import (write_restart_file,
                                              restore_state_from_restart,
                                              _state_leaves)
    C = _halfar_config()
    r = ModelRegion(C, "ANT")
    r.run_to(10.0)
    path = str(tmp_path / "restart.nc")
    write_restart_file(path, r.mesh, r.state, r.time)

    # scramble the state, then restore
    scr = r.state.replace(Hi=r.state.Hi * 0.5,
                          pc=r.state.pc.replace(dt_n=r.state.pc.dt_n * 7))
    t, restored = restore_state_from_restart(scr, path)
    assert t == pytest.approx(r.time)
    a = _state_leaves(r.state)
    b = _state_leaves(restored)
    for k in a:
        assert np.allclose(np.asarray(a[k]), np.asarray(b[k]),
                           equal_nan=True), k


def test_restart_resume_matches_uninterrupted(tmp_path):
    """Run 0->40; restart at 20; scalars match the uninterrupted run
    (the reference's resume contract)."""
    from ufemism2_tpu.main.region import ModelRegion
    from ufemism2_tpu.io.output_files import write_restart_file

    C = _halfar_config()
    r1 = ModelRegion(C, "ANT")
    r1.run_to(20.0)
    path = str(tmp_path / "restart.nc")
    write_restart_file(path, r1.mesh, r1.state, r1.time)
    r1.run_to(40.0)
    Hi_full = np.asarray(r1.state.Hi)

    r2 = ModelRegion(C, "ANT", mesh=r1.mesh)
    r2.resume_from_restart(path)
    assert r2.time == pytest.approx(20.0)
    r2.run_to(40.0)
    Hi_resumed = np.asarray(r2.state.Hi)

    scale = np.abs(Hi_full).max()
    assert np.abs(Hi_full - Hi_resumed).max() < 1e-6 * scale


def test_restart_persists_host_counters(tmp_path):
    """n_dt_ice (host-side stability counter) survives write->resume, so
    scoreboard stability metrics are cumulative across legs (the
    reference persists pc state + counters,
    predictor_corrector_scheme.f90:510-620)."""
    from ufemism2_tpu.main.region import ModelRegion
    from ufemism2_tpu.io.output_files import (write_restart_file,
                                              load_restart_host_counters)

    C = _halfar_config()
    r1 = ModelRegion(C, "ANT")
    r1.run_to(20.0)
    assert r1.n_dt_ice > 0
    path = str(tmp_path / "restart.nc")
    write_restart_file(path, r1.mesh, r1.state, r1.time,
                       host_counters={"n_dt_ice": int(r1.n_dt_ice)})
    assert load_restart_host_counters(path)["n_dt_ice"] == r1.n_dt_ice

    r2 = ModelRegion(C, "ANT", mesh=r1.mesh)
    r2.resume_from_restart(path)
    assert r2.n_dt_ice == r1.n_dt_ice
    r2.run_to(40.0)
    assert r2.n_dt_ice > r1.n_dt_ice


def test_pc_initialise_from_file(tmp_path):
    """pc_choice_initialise='read_from_file' warm-starts the dt
    controller."""
    from ufemism2_tpu.main.region import ModelRegion
    from ufemism2_tpu.io.output_files import write_restart_file

    C = _halfar_config()
    r1 = ModelRegion(C, "ANT")
    r1.run_to(15.0)
    path = str(tmp_path / "restart.nc")
    write_restart_file(path, r1.mesh, r1.state, r1.time)

    C2 = _halfar_config(pc_choice_initialise_ANT="read_from_file",
                        filename_pc_initialise_ANT=path)
    r2 = ModelRegion(C2, "ANT", mesh=r1.mesh)
    assert float(r2.state.pc.dt_np1) == pytest.approx(
        float(r1.state.pc.dt_np1))
    assert float(r2.state.pc.eta_np1) == pytest.approx(
        float(r1.state.pc.eta_np1))
