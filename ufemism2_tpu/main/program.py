"""The UFEMISM-TPU program: CLI entry point.

Re-design of src/UFEMISM/main/UFEMISM_program.f90: run up to four model
regions (NAM/EAS/GRL/ANT) sequentially through the coupling loop, or the
unit/component test suites.

Usage:
    python -m ufemism2_tpu <config.cfg> [--output-dir DIR]
    python -m ufemism2_tpu unit_tests
"""

from __future__ import annotations

import argparse
import sys
import time as _time
from pathlib import Path

from ..config import load_config
from ..utils.logging_utils import happy, get_tracker
from ..models.forcings import GlobalForcings


REGIONS = ["NAM", "EAS", "GRL", "ANT"]


def write_run_manifest(out_dir, config_path):
    """Run manifest: git commit + library versions, the reference's
    pre-compile stamping (git_commit_hash_and_package_versions.f90,
    compile_UFEMISM.csh:73-78) done at run time instead."""
    import json
    import platform
    from ..validation.scoreboard import git_hash

    versions = {}
    for mod in ("jax", "numpy", "scipy", "h5py"):
        try:
            versions[mod] = __import__(mod).__version__
        except Exception:
            versions[mod] = "unavailable"
    manifest = {
        "git_hash": git_hash(short=False),
        "config": str(config_path),
        "started": _time.strftime("%Y-%m-%dT%H:%M:%S"),
        "python": platform.python_version(),
        "platform": platform.platform(),
        "versions": versions,
    }
    try:
        import jax
        manifest["devices"] = [str(d) for d in jax.devices()]
    except Exception:
        pass
    (Path(out_dir) / "run_manifest.json").write_text(
        json.dumps(manifest, indent=1))


def _write_resource_record(out: Path, t: float):
    """Append one coupling interval's per-routine wall times to
    <out>/resource_tracking.jsonl and reset the tracker (the reference
    writes its resource NetCDF and resets each coupling interval,
    netcdf_resource_tracking.f90:26-149). Consumed by
    upsy-analyse-resources (tools/analyse_resources.py)."""
    import json
    tr = get_tracker()
    rec = {"t": float(t), "routines": tr.as_dict()}
    with open(out / "resource_tracking.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    tr.reset()


def run_model(config_path: str, output_dir: str | None = None):
    from .region import ModelRegion

    C = load_config(config_path)
    if output_dir is None:
        if C.create_procedural_output_dir:
            stamp = _time.strftime("%Y%m%d")
            n = 1
            while Path(f"results_{stamp}_{n:03d}").exists():
                n += 1
            output_dir = f"results_{stamp}_{n:03d}"
        else:
            output_dir = C.fixed_output_dir or "results"
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    # copy the config into the output dir (reference does the same)
    (out / Path(config_path).name).write_text(Path(config_path).read_text())
    write_run_manifest(out, config_path)

    forcings = GlobalForcings(C)

    regions = {}
    for name in REGIONS:
        if getattr(C, f"do_{name}"):
            happy("Initialising model region {} ...", name)
            regions[name] = ModelRegion(C, name, output_dir=str(out / name))

    if not regions:
        print("No regions enabled in config (do_NAM/EAS/GRL/ANT).")
        return {}

    # the coupling loop (UFEMISM_program.f90:99-129)
    t = C.start_time_of_run
    Hs_cur = 1.0
    while t < C.end_time_of_run - 1e-9:
        t_next = min(t + C.dt_coupling, C.end_time_of_run)
        forcings.update(t)
        # plumb the global sea level into every region
        # (update_sealevel_at_model_time, UFEMISM_main_model.f90)
        if forcings.choice_sealevel != "fixed" \
                or forcings.sealevel != 0.0:
            for region in regions.values():
                region.set_sealevel(forcings.sealevel)
        for name, region in regions.items():
            happy("  Running region {} to t = {:.1f} yr ...", name, t_next)
            region.run_to(t_next)
        t = t_next
        # per-coupling-interval resource-tracking record + reset
        # (write_to_resource_tracking_file / reset_resource_tracker,
        # UFEMISM_program.f90:99-129; JSON instead of NetCDF-int-paths)
        _write_resource_record(out, t)

        # MISMIP+ flow-factor tuning for the GL position
        # (UFEMISM_program.f90:114-123)
        if C.refgeo_idealised_MISMIPplus_tune_A and "ANT" in regions:
            import numpy as np
            Hs_prev = Hs_cur
            Hs_cur = float(np.asarray(regions["ANT"].state.Hs).max())
            if abs(1.0 - Hs_cur / Hs_prev) < 5.0e-3:
                C = mismipplus_adapt_flow_factor(C, regions["ANT"])

    for name, region in regions.items():
        region.write_output()
        happy("Region {}: {} ice-dynamics steps, final scalars: {}",
              name, region.n_dt_ice,
              region.scalars_history[-1] if region.scalars_history else {})

    print(get_tracker().report())
    return regions


def mismipplus_adapt_flow_factor(C, region):
    """Tune the uniform Glen flow factor so the steady-state mid-channel
    grounding line sits at x = 450 km
    (inversion_utilities.f90 MISMIPplus_adapt_flow_factor: 92-140)."""
    import numpy as np
    from scipy.interpolate import LinearNDInterpolator

    if C.choice_ice_rheology_Glen != "uniform":
        raise RuntimeError(
            "MISMIP+ flow-factor tuning needs a uniform flow factor")
    mesh = region.mesh
    TAF = np.asarray(region.state.TAF)
    interp = LinearNDInterpolator(mesh.V, TAF, fill_value=-1.0)
    dx = C.maximum_resolution_grounding_line
    xs = np.arange(mesh.xmin, mesh.xmax + dx / 2, dx)
    taf_line = interp(np.column_stack([xs, np.zeros_like(xs)]))
    sign_change = np.flatnonzero((taf_line[:-1] > 0) & (taf_line[1:] <= 0))
    if len(sign_change) == 0:
        return
    i = sign_change[0]
    lam = taf_line[i] / (taf_line[i] - taf_line[i + 1])
    x_GL = (1 - lam) * xs[i] + lam * xs[i + 1]

    # The reference's raw proportional controller
    # (f = 2^((x_GL-450km)/80km), inversion_utilities.f90:135) has gain
    # ~2x per adaptation; on our mesh its dx_GL/dlogA sensitivity makes
    # the GL oscillate +-100 km around the target, and every swing
    # drives remesh + dt_ice_min resets (measured ~1160 Axb its/sim-yr
    # during the swings vs ~40 converged). The fixed point - the A for
    # which the steady GL sits at 450 km - is unchanged by the gain, so
    # damp bisection-style: halve the exponent gain every time the
    # error changes sign, restore it slowly while the sign persists.
    err = x_GL - 450e3
    tune = getattr(region, "_mismip_tune", None)
    if tune is None:
        tune = region._mismip_tune = {"gain": 1.0, "last_err": None}
    if tune["last_err"] is not None and err * tune["last_err"] < 0:
        tune["gain"] = max(0.125, tune["gain"] * 0.5)
    elif tune["last_err"] is not None:
        tune["gain"] = min(1.0, tune["gain"] * 1.1)
    tune["last_err"] = err
    f = 2.0 ** (tune["gain"] * err / 80000.0)
    if region.md.extras and "glen_A_scale" in region.md.extras:
        # dynamic multiplier traced through md: update in place, no
        # re-jit (the rheology reads C.uniform_Glens_flow_factor *
        # glen_A_scale; see core/ice/rheology.py)
        e = region.md.extras["glen_A_scale"]
        e.arr = e.arr * f
        A_eff = C.uniform_Glens_flow_factor * float(np.asarray(e.arr))
        happy("    MISMIPplus_adapt_flow_factor: x_GL = {:.1f} km; "
              "flow factor -> {:.3e}", x_GL / 1e3, A_eff)
        return C
    C = C.replace(
        uniform_Glens_flow_factor=C.uniform_Glens_flow_factor * f)
    region.C = C
    happy("    MISMIPplus_adapt_flow_factor: x_GL = {:.1f} km; "
          "flow factor -> {:.3e}", x_GL / 1e3, C.uniform_Glens_flow_factor)
    # the flow factor is baked into the jitted step at trace time:
    # rebuild the stepping machinery (rare event, amortised)
    from ..core.ice.pc import make_pc_step, make_pc_multistep
    region.pc_step = make_pc_step(
        C, region.md, refgeo_Hi=region.refgeo_PD[0],
        refgeo_Hb=region.refgeo_PD[1],
        bedrock_cdfs=getattr(region, "_bedrock_cdfs", None))
    region.pc_multistep = make_pc_multistep(
        C, region.pc_step,
        thermo_step=region._thermo_step
        if getattr(region, "_thermo_fused", False) else None)
    return C


def main(argv=None):
    p = argparse.ArgumentParser(prog="ufemism2_tpu", description=__doc__)
    p.add_argument("config", help="path to a .cfg namelist, 'unit_tests', or "
                   "'laddie' (standalone LADDIE, config as second argument; "
                   "LADDIE_program.f90 equivalent)")
    p.add_argument("laddie_config", nargs="?", default=None,
                   help="config path when the first argument is 'laddie'")
    p.add_argument("--output-dir", default=None)
    args = p.parse_args(argv)

    if args.config == "unit_tests":
        import pytest
        sys.exit(pytest.main(["-x", "-q",
                              str(Path(__file__).parents[2] / "tests")]))
    if args.config == "component_tests":
        from ..validation.component_tests import run_all_component_tests
        run_all_component_tests(args.output_dir or "scoreboard")
        return
    if args.config in ("integrated_tests", "integrated_tests_full"):
        from ..validation.integrated_tests import run_all_integrated_tests
        run_all_integrated_tests(args.output_dir or "scoreboard",
                                 quick=args.config == "integrated_tests")
        return
    if args.config == "laddie":
        from .laddie_program import run_laddie_standalone
        if not args.laddie_config:
            p.error("'laddie' requires a config path as the second argument")
        run_laddie_standalone(args.laddie_config, args.output_dir)
        return
    run_model(args.config, args.output_dir)


if __name__ == "__main__":
    main()
