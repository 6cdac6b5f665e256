"""Multi-chip demonstration at production scale (VERDICT r2 item 6).

Shards the FULL PC step on the real MISMIP 8 km mesh (the bench/north-star
mesh, ~13k vertices / ~26k triangles) over an 8-device jax.sharding.Mesh,
runs several steps, and records single-device parity plus the halo-table
size / per-device occupancy statistics the reference reports for its MPI
partitions (mpi_basic.f90:78-129). Writes
validation_runs/MULTICHIP_scale.json.

Two legs:
  f64 — the machine-parity gate. Single-device and sharded use the same
        gather-ELL arithmetic, so the trajectories must agree to
        accumulated-roundoff level (<1e-6 rel over 3 steps).
  f32 — the performance mode. Its validated invariant is ACCURACY, not
        cross-layout reproducibility: f32 trajectories are not
        bitwise-reproducible across partitionings (reduction order
        differs, and the GMRES stagnation exit + grounding-line flicker
        amplify last-bit differences into percent-level converged-state
        spread - measured in round 4), exactly like any production f32
        HPC code under MPI reduction reordering. The leg therefore
        measures the drift of BOTH the 1-device and the n-device f32
        runs against the f64 truth trajectory and passes when the
        sharded f32 run approximates f64 no worse than the single-device
        f32 run (factor-2 band + the established f32 noise floor). The
        documented policy: f64 is the parity/scored mode; f32 is the
        throughput mode, validated against f64 physics per run, never
        used for scored gate entries.

Run with a scrubbed CPU environment:
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/multichip_scale_demo.py [n_devices] [n_steps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CFG = ("/root/reference/config-files/"
       "config_MISMIP_8km_spinup_for_scaling.cfg")


def run_leg(precision, n_devices, n_steps):
    import jax
    import jax.numpy as jnp
    from ufemism2_tpu.config import load_config
    from ufemism2_tpu.main.region import ModelRegion
    from ufemism2_tpu.parallel.dist import ShardedModel

    # f64 compares LAYOUTS at machine precision, so the viscosity
    # iteration may be truncated (cheap); f32 compares CONVERGED states:
    # at f32, GMRES stagnation on the membrane operator is sensitive to
    # rounding order (the PERF_NOTES noise-regularisation anomaly), so
    # UNconverged iterates after a fixed 2 Picard its are chaotic w.r.t.
    # partitioning (measured O(1) rel-du) while converged states agree
    # to solver tolerance.
    nit = {"f64": 2, "f32": 20}[precision]
    C = load_config(CFG, tpu_precision=precision,
                    allow_mesh_updates=False, visc_it_nit=nit)
    t0 = time.perf_counter()
    region = ModelRegion(C, "ANT")
    build_s = time.perf_counter() - t0
    print(f"[{precision}] mesh: nV={region.mesh.nV} nTri={region.mesh.nTri}"
          f" (built in {build_s:.1f}s)", flush=True)

    if precision == "f32":
        # 1-device run of the SAME distributed code (the f32 "best
        # case": identical arithmetic, no halo/psum reordering)
        SM1 = ShardedModel(C, region, 1)
        sd1 = SM1.to_dist(region.state)
        for _ in range(n_steps):
            sd1 = SM1.step(sd1, 1.0)
            sd1 = sd1.replace(Hi=sd1.Hi_next, Hi_prev=sd1.Hi)
        jax.block_until_ready(jax.tree_util.tree_leaves(sd1)[0])
        s1 = SM1.from_dist(sd1)
    else:
        # f64: gather-ELL arithmetic is shared between the single-device
        # and dist paths, so the cross-layout comparison is exact
        s1 = region.state
        for _ in range(n_steps):
            s1 = region.pc_step(region.md, s1, jnp.asarray(1.0))
            s1 = s1.replace(Hi=s1.Hi_next, Hi_prev=s1.Hi)
        jax.block_until_ready(s1.Hi_next)

    # sharded trajectory
    t0 = time.perf_counter()
    SM = ShardedModel(C, region, n_devices)
    sd = SM.to_dist(region.state)
    for _ in range(n_steps):
        sd = SM.step(sd, 1.0)
        sd = sd.replace(Hi=sd.Hi_next, Hi_prev=sd.Hi)
    jax.block_until_ready(jax.tree_util.tree_leaves(sd)[0])
    shard_s = time.perf_counter() - t0
    s2 = SM.from_dist(sd)

    Hi1, Hi2 = np.asarray(s1.Hi_next), np.asarray(s2.Hi_next)
    u1, u2 = np.asarray(s1.u_vav_b), np.asarray(s2.u_vav_b)
    dHi = float(np.max(np.abs(Hi1 - Hi2)) / max(np.max(np.abs(Hi1)), 1.0))
    du = float(np.max(np.abs(u1 - u2)) / max(np.max(np.abs(u1)), 1e-30))
    leg = {
        "parity": {"rel_dHi_vs_single_device": dHi,
                   "rel_du_vav_vs_single_device": du},
        "sharded_wall_s_incl_compile": round(shard_s, 1),
        "solver": {"n_visc_its": int(s2.n_visc_its),
                   "n_Axb_its": int(s2.n_Axb_its)},
    }
    return region, SM, leg, s1, s2


def main(n_devices=8, n_steps=3):
    import jax
    assert jax.devices()[0].platform == "cpu" and \
        len(jax.devices()) >= n_devices, \
        "run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform" \
        f"_device_count={n_devices}"

    region, SM, leg64, s64_single, _ = run_leg("f64", n_devices, n_steps)
    _, _, leg32, s32_single, s32_shard = run_leg("f32", n_devices, n_steps)

    # f32 accuracy policy: both the 1-device and the n-device f32 runs
    # are approximations OF THE F64 TRUTH; the sharded one must be no
    # worse. (The two f32 runs use identical per-step work here only up
    # to reduction order, so this is the strongest f32 statement that
    # survives partitioning - see module docstring.)
    # NOTE: the f64 truth above ran visc_it_nit=2 (machine-parity leg);
    # re-run it converged for the accuracy comparison.
    from ufemism2_tpu.config import load_config as _lc
    from ufemism2_tpu.main.region import ModelRegion as _MR
    import jax.numpy as _jnp
    import jax as _jax
    C64 = _lc(CFG, tpu_precision="f64", allow_mesh_updates=False,
              visc_it_nit=20)
    r64 = _MR(C64, "ANT")
    s_t = r64.state
    for _ in range(n_steps):
        s_t = r64.pc_step(r64.md, s_t, _jnp.asarray(1.0))
        s_t = s_t.replace(Hi=s_t.Hi_next, Hi_prev=s_t.Hi)
    _jax.block_until_ready(s_t.Hi_next)

    def drift(s_f32):
        a = np.asarray(s_t.Hi_next)
        b = np.asarray(s_f32.Hi_next)
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1.0))

    d_single = drift(s32_single)
    d_shard = drift(s32_shard)
    leg32["accuracy_vs_f64"] = {
        "rel_dHi_f32_single_vs_f64": d_single,
        "rel_dHi_f32_sharded_vs_f64": d_shard,
    }

    stats = {}
    for name, sp in SM.spaces.items():
        n_own = sp.nL * n_devices
        stats[name] = {
            "n_global": int(sp.n),
            "rows_per_device": int(sp.nL),
            "halo_recv_width_Hh": int(sp.Hh),
            "halo_send_width_Hs": int(sp.Hs),
            "halo_frac_of_local": round(sp.Hh / max(sp.nL, 1), 4),
            "pad_occupancy": round(sp.n / n_own, 4),
        }

    ok64 = (leg64["parity"]["rel_dHi_vs_single_device"] < 1e-6
            and leg64["parity"]["rel_du_vav_vs_single_device"] < 1e-6)
    # f32 passes when sharding does not degrade the f64-approximation
    # quality (factor-2 band + the f32 noise floor from the published
    # precision_drift bound)
    ok32 = d_shard <= 2.0 * d_single + 5e-3
    art = {
        "ok": bool(ok64 and ok32),
        "n_devices": n_devices,
        "n_steps": n_steps,
        "mesh": {"nV": int(region.mesh.nV), "nTri": int(region.mesh.nTri),
                 "config": "MISMIP_8km_spinup_for_scaling (north-star mesh)"},
        "f64_machine_parity_leg": leg64,
        "f32_perf_mode_leg": leg32,
        "f32_policy": (
            "f64 is the parity/scored mode; f32 is the throughput mode. "
            "f32 trajectories are not reproducible across partitionings "
            "(reduction order + GL flicker amplification), so the f32 "
            "gate is ACCURACY VS F64: the sharded f32 run must "
            "approximate the converged f64 trajectory no worse than the "
            "1-device f32 run (<= 2x + 5e-3 band). Scored gate entries "
            "never run f32."),
        "spaces": stats,
    }
    out = os.path.join(os.path.dirname(__file__), "..",
                       "validation_runs", "MULTICHIP_scale.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1), flush=True)
    assert art["ok"], "sharded trajectory diverged at production scale"


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
