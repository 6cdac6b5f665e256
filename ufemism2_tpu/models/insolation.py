"""Insolation forcing: monthly top-of-atmosphere shortwave at mesh latitudes.

Re-design of the reference's insolation handling
(src/UFEMISM/climate/climate_realistic.f90:245-322
initialise_insolation_forcing, climate_model_utilities.f90:334-443
get_insolation_at_time / update_insolation_timeframes_from_file): the
reference keeps a 2-frame window and re-reads the NetCDF whenever model
time leaves it. TPU-first design: preload every Laskar timeframe the run
can touch (window [t_start, t_end] + one frame either side) onto the
device as one [n_frames, nV, 12] array at init, and interpolate with pure
jnp inside jit - no host I/O in the hot path, at the cost of HBM
(~0.1 GB for a 120 kyr Antarctic run, an easy trade).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class InsolationForcing:
    """Q_TOA(t) [nV, 12]; jit-pure `at_time`."""

    def __init__(self, C, mesh, dtype=jnp.float64):
        self.choice = C.choice_insolation_forcing
        if self.choice == "none":
            self._static = jnp.zeros((mesh.nV, 12), dtype)
            return
        if self.choice not in ("static", "realistic"):
            raise ValueError(
                f"unknown choice_insolation_forcing '{self.choice}'")

        from ..io.input_files import (read_field_from_file_2D_monthly,
                                      read_series_from_file)
        from ..io.ncio import NCFile, find_field

        fname = C.filename_insolation
        with NCFile(fname) as nc:
            t_all = np.asarray(find_field(nc, "time"), dtype=np.float64)

        if self.choice == "static":
            t_want = [float(t_all[np.argmin(
                np.abs(t_all - C.static_insolation_time))])]
        else:
            t0 = min(C.start_time_of_run, 0.0)
            t1 = C.end_time_of_run
            i0 = max(0, int(np.searchsorted(t_all, t0)) - 1)
            i1 = min(len(t_all), int(np.searchsorted(t_all, t1)) + 2)
            t_want = list(t_all[i0:i1])

        frames = [read_field_from_file_2D_monthly(
            fname, "insolation", mesh, time_to_read=t) for t in t_want]
        Q = np.stack(frames)                        # [n_frames, nV, 12]
        if self.choice == "static":
            self._static = jnp.asarray(Q[0], dtype)
        else:
            self._static = None
            self._t = jnp.asarray(np.asarray(t_want), dtype)
            self._Q = jnp.asarray(Q, dtype)

    def at_time(self, time):
        """[nV, 12] insolation at model time (pure jnp; clamped to the
        preloaded window ends, matching the reference's wt safety)."""
        if self._static is not None:
            return self._static
        t = jnp.clip(time, self._t[0], self._t[-1])
        i = jnp.clip(jnp.searchsorted(self._t, t) - 1, 0, len(self._t) - 2)
        w = (t - self._t[i]) / (self._t[i + 1] - self._t[i])
        return (1.0 - w) * self._Q[i] + w * self._Q[i + 1]
