"""NaN sanitizer: the reference's do_check_for_NaN mode
(src/UPSY/basic/checks .f90-style field scans, enabled in dev builds via
`-fcheck=all -finit-real=nan`, compile_UFEMISM.csh:55).

On TPU the equivalent is (a) a jitted any-NaN/Inf scan over every IceState
field after each dispatch - ONE extra reduction kernel, negligible cost -
and (b) optionally `jax.config.jax_debug_nans` for eager fault isolation
(set via enable_debug_nans(); global and slow, debug only).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


class NaNDetected(RuntimeError):
    pass


def _leaf_items(state, prefix=""):
    for f in dataclasses.fields(state):
        v = getattr(state, f.name)
        name = prefix + f.name
        if dataclasses.is_dataclass(v):
            yield from _leaf_items(v, name + ".")
        else:
            yield name, v


@jax.jit
def _nonfinite_flags(leaves):
    return [jnp.logical_not(jnp.isfinite(l)).any()
            if jnp.issubdtype(l.dtype, jnp.floating) else jnp.asarray(False)
            for l in leaves]


def check_state_for_nan(state, where: str = ""):
    """Raise NaNDetected naming every non-finite IceState field (the
    reference's do_check_for_NaN crash('NaN in ...') behaviour)."""
    names, leaves = zip(*[(n, jnp.asarray(v)) for n, v in
                          _leaf_items(state)])
    flags = jax.device_get(_nonfinite_flags(list(leaves)))
    bad = [n for n, f in zip(names, flags) if bool(f)]
    if bad:
        raise NaNDetected(
            f"non-finite values in state fields {bad}"
            + (f" at {where}" if where else ""))


def enable_debug_nans():
    """Eager NaN fault isolation (jax.config.jax_debug_nans): every
    primitive re-runs un-jitted when a NaN appears, pinpointing the op.
    Global and slow - debug sessions only."""
    jax.config.update("jax_debug_nans", True)
