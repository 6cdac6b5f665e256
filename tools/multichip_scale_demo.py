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
  f32 — the performance mode. Since round 4 the dist path stores the
        SAME split-bf16 (hi, lo) slabs as the single-device tiled
        operators and contracts with identical arithmetic (x rounded to
        bf16); the leg's parity statement is PARTITIONING-ONLY — the
        same distributed code on 1 vs n devices — so only halo exchange
        and psum partial order differ (VERDICT r3 item 8). Solver-effort
        stats come from this leg.

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
        # the f32 invariant is PARTITIONING-ONLY: the same distributed
        # code on 1 device vs n devices (same split-bf16 products, same
        # per-row reductions; only halo exchange + psum partial order
        # differ). Comparing against the single-device TILED path
        # instead compares two layouts' f32 accumulation orders through
        # a TRUNCATED (visc_it_nit=2) nonlinear iteration - a chaotic-
        # trajectory comparison, not an arithmetic statement (the f64
        # leg shows the same layout comparison amplifies machine eps by
        # ~1e4).
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
    return region, SM, leg


def main(n_devices=8, n_steps=3):
    import jax
    assert jax.devices()[0].platform == "cpu" and \
        len(jax.devices()) >= n_devices, \
        "run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform" \
        f"_device_count={n_devices}"

    region, SM, leg64 = run_leg("f64", n_devices, n_steps)
    _, _, leg32 = run_leg("f32", n_devices, n_steps)

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
    ok32 = (leg32["parity"]["rel_dHi_vs_single_device"] < 1e-3
            and leg32["parity"]["rel_du_vav_vs_single_device"] < 1e-3)
    art = {
        "ok": bool(ok64 and ok32),
        "n_devices": n_devices,
        "n_steps": n_steps,
        "mesh": {"nV": int(region.mesh.nV), "nTri": int(region.mesh.nTri),
                 "config": "MISMIP_8km_spinup_for_scaling (north-star mesh)"},
        "f64_machine_parity_leg": leg64,
        "f32_perf_mode_leg": leg32,
        "f32_parity_note": (
            "single-device and dist f32 both use split-bf16 (hi, lo) "
            "slabs with x rounded to bf16 (identical products; only the "
            "f32 accumulation order differs between the tiled and the "
            "extended-local ELL layouts), so trajectories agree to "
            "accumulated f32 roundoff rather than solver tolerance"),
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
