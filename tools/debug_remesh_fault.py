"""Instrumented repro of the MISMIP+ post-remesh first-dispatch fault.

Replicates exactly what tools/run_gate.py mismipplus_spinup does on
resume (integrated_tests._mismip_resume_region + the first run_to
dispatch), but splits the work into separately timed phases so the
crash localises to compile vs execute, and prints a wall-clock
heartbeat so the log shows how long the final blocking call survived.

Usage:  timeout 600 python tools/debug_remesh_fault.py [n_max]
Env:    JAX_PLATFORMS=cpu for a ground-truth replay off the TPU.
"""
import os
import sys
import threading
import time as _time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

T0 = _time.perf_counter()


def say(msg):
    print(f"[{_time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


def heartbeat():
    while True:
        _time.sleep(10.0)
        print(f"[hb {_time.perf_counter() - T0:7.1f}s]", flush=True)


threading.Thread(target=heartbeat, daemon=True).start()

import numpy as np
import jax
import jax.numpy as jnp

from ufemism2_tpu.validation import integrated_tests as it
from ufemism2_tpu.validation.integrated_tests import (
    REF_TESTS, _load, _mismip_resume_region)

say(f"jax devices: {jax.devices()}")

cfg = REF_TESTS / "idealised/MISMIPplus/config_01_5km_spinup_part0.cfg"
C = _load(cfg, refgeo_idealised_MISMIPplus_Hi_init=100.0,
          dt_output_restart=500.0)
out_dir = Path(__file__).resolve().parent.parent / \
    "validation_runs/mismipplus_5km_spinup"

say("building region (resume)...")
r, resumed = _mismip_resume_region(C, str(out_dir))
say(f"region ready: resumed={resumed} t={r.time} nV={r.mesh.nV} "
    f"nTri={r.mesh.nTri} thermo_fused={r._thermo_fused} "
    f"dist={r._dist is not None}")

# replicate the first run_to dispatch verbatim (region.py run_to)
r._run_components()
say("components refreshed")

dt_max = C.dt_ice_max
t_stop = min([r.time + C.dt_coupling] + list(r.t_next.values()))
if C.allow_mesh_updates:
    t_stop = min(t_stop, r.t_last_mesh_update + C.dt_mesh_update_min) \
        if hasattr(r, "t_last_mesh_update") \
        else min(t_stop, r.time + C.dt_mesh_update_min)
n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 1
say(f"dispatch target: t_stop={t_stop} n_max={n_max} "
    f"t_Hi_next={float(r.state.t_Hi_next)}")

if r._thermo_fused:
    args = (r.md, r.state, jnp.asarray(t_stop), jnp.asarray(dt_max),
            r.SMB, r.BMB, r.LMB, r._T_surf,
            jnp.asarray(r.t_thermo_next), jnp.int32(n_max))
else:
    args = (r.md, r.state, jnp.asarray(t_stop), jnp.asarray(dt_max),
            r.SMB, r.BMB, r.LMB, jnp.int32(n_max))

say("lowering pc_multistep...")
lowered = r.pc_multistep.lower(*args)
say("lowered. compiling...")
compiled = lowered.compile()
say("compiled. executing 1 dispatch...")
out = compiled(*args)
if r._thermo_fused:
    s, n, t_th = out
else:
    s, n = out
n_int = int(n)
say(f"executed: n={n_int} dt={float(s.dt_ice):.4f} "
    f"t_Hi_next={float(s.t_Hi_next):.3f} "
    f"visc_its={int(s.n_visc_its)} axb={int(s.n_Axb_its)}")
say(f"Hi range: {float(jnp.min(s.Hi)):.2f}..{float(jnp.max(s.Hi)):.2f} "
    f"NaN={bool(jnp.any(jnp.isnan(s.Hi)))}")
say("OK - no fault")
