"""Validation tier: component tests produce sane cost functions and
scoreboard files (the reference's ct_* + scoreboard apparatus)."""

import json

import numpy as np
import pytest

from ufemism2_tpu.validation.component_tests import (
    create_test_meshes, run_map_deriv_tests, run_laplace_test,
    run_remapping_tests, run_mass_conservation_test)
from ufemism2_tpu.validation.scoreboard import (ScoreboardRun,
                                                read_scoreboard_dir)


@pytest.fixture(scope="module")
def meshes():
    return create_test_meshes(resolutions=[500e3, 400e3], gradients=False)


def _cf(run, name):
    for cf in run.cost_functions:
        if cf["name"] == name:
            return cf["value"]
    raise KeyError(name)


def test_map_deriv_accuracy(meshes, tmp_path):
    name, mesh = meshes[1]
    runs = run_map_deriv_tests(mesh, name, scoreboard_dir=tmp_path)
    by_fn = {r.name.rsplit("_", 1)[-1]: r for r in runs}
    # linear functions: everything is exact to rounding
    for cf in by_fn["linear"].cost_functions:
        assert cf["value"] < 1e-10, cf
    # quadratic: 1st-order ddx operators are 2nd-order accurate -> small
    # relative to the gradient scale (|df/dx| ~ 1e-6)
    assert _cf(by_fn["quadratic"], "rmse_ddx_a_a") < 1e-1
    # quadratic: M2 operators reproduce 2nd derivatives exactly
    assert _cf(by_fn["quadratic"], "rmse_M2_d2dx2_b_b") < 1e-12
    # scoreboard files written
    entries = read_scoreboard_dir(tmp_path)
    assert len(entries) == 3
    assert entries[0]["cost_functions"]


def test_laplace_solve(meshes):
    name, mesh = meshes[0]
    run = run_laplace_test(mesh, name)
    # the quadratic exact solution is in the operators' reproduction space
    assert _cf(run, "rmse_Laplace") < 1e-9


def test_remapping_conservation(meshes):
    run = run_remapping_tests(meshes[1][1], meshes[0][1], "t")
    assert _cf(run, "conservation_mesh_to_mesh") < 1e-2
    assert _cf(run, "conservation_grid_to_mesh") < 1e-2
    assert _cf(run, "rmse_mesh_to_mesh") < 0.05


def test_mass_conservation_tiers(meshes):
    name, mesh = meshes[0]
    runs = run_mass_conservation_test(mesh, name)
    by = {r.name.rsplit("_", 1)[-1]: r for r in runs}
    # linear ice sheet: explicit scheme is exact (constant H, linear u)
    assert _cf(by["linear"], "rmse_dHi_dt_explicit") < 1e-10
    # the implicitness ladder behaves monotonically for the linear sheet
    assert _cf(by["linear"], "rmse_dHi_dt_semiimplicit") \
        < _cf(by["linear"], "rmse_dHi_dt_overimplicit")
    # periodic/Halfar: first-order upwind gives O(h) errors, bounded
    assert _cf(by["periodic"], "rmse_dHi_dt_explicit") < 5.0
    assert _cf(by["Halfar"], "rmse_dHi_dt_explicit") < 50.0


def test_scoreboard_roundtrip(tmp_path):
    run = ScoreboardRun("mytest", "integrated_tests/idealised/Foo")
    run.add_cost_function("rmse", "sqrt(mean(e^2))", 13.38)
    run.add_stability_info({"n_dt_ice": 2625, "n_visc_its": 0,
                            "n_Axb_its": 0})
    path = run.write(tmp_path)
    assert "it_ideal_Foo" in path.name
    data = json.loads(path.read_text())
    assert data["cost_functions"][0]["value"] == 13.38
    assert any(cf["name"] == "n_dt_ice" for cf in data["cost_functions"])
