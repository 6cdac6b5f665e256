"""UFEMISM2-TPU: a TPU-native finite-volume ice-sheet modelling framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of UFEMISM 2.0 /
the UPSY models toolkit (reference: Fortran 2018 + MPI + PETSc at
/root/reference; see SURVEY.md):

- adaptive unstructured Voronoi/Delaunay mesh engine (host-side numpy build,
  device-resident padded ELL operators),
- least-squares finite-volume discretisation operators (Syrakos et al. 2017
  style shape functions),
- ice dynamics: SIA / SSA / DIVA / BPA stress balances with matrix-free
  preconditioned Krylov solvers replacing PETSc KSP,
- predictor-corrector mass-conservation time stepping (Robinson et al. 2020),
- 3-D thermodynamics on a zeta grid (batched tridiagonal solves),
- SMB/BMB/LMB/AMB, climate, ocean, GIA couplings, LADDIE plume model,
- conservative mesh<->mesh / grid<->mesh remapping for adaptive meshing,
- multi-chip mesh sharding over a jax.sharding.Mesh with ICI halo exchange
  replacing MPI halo exchange.

Precision policy: the reference computes everything in float64
(src/UPSY/basic/precisions.f90). We enable x64 support so parity runs can use
f64, while the performance path uses validated f32 (see utils/dtypes.py).
"""

import os

import jax

# The reference is float64 throughout; enable x64 so parity tests can match.
# Performance-mode (TPU) runs select f32 via Config.tpu_precision.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the axon TPU backend remote-compiles every
# kernel; caching across processes turns ~minutes of warmup into seconds.
_cache_dir = os.environ.get("UFEMISM_TPU_JAX_CACHE",
                            os.path.expanduser("~/.cache/ufemism2_tpu_jax"))
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # threshold 0: on the axon backend the cost of an eager op is the
    # remote-compile round-trip, not local compile time, so cache everything
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # cache is an optimisation only
    pass

__version__ = "0.1.0"
