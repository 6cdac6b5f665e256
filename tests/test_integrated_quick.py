"""Integrated-test runner: the Halfar quick tier end-to-end (reference
config -> model run -> cost function -> scoreboard JSON)."""

import json

import pytest


@pytest.mark.slow
def test_halfar_quick_scoreboard(tmp_path):
    from ufemism2_tpu.validation.integrated_tests import run_halfar
    run = run_halfar(scoreboard_dir=tmp_path, resolution_km=40, quick=True)
    rmse = next(cf["value"] for cf in run.cost_functions
                if cf["name"] == "rmse")
    # 40 km mesh, 50 yr: well under 60 m (the 200 yr bench run reaches
    # 29.7 m vs the reference's 34.9 m at the same resolution)
    assert rmse < 60.0
    n_dt = next(cf["value"] for cf in run.cost_functions
                if cf["name"] == "n_dt_ice")
    assert n_dt > 10
    files = list(tmp_path.glob("it_ideal_Hlf_dome_*.json"))
    assert len(files) == 1
    data = json.loads(files[0].read_text())
    assert data["category"].startswith("integrated_tests")
