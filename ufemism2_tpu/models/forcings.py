"""Global forcings: CO2, sea level, insolation time series.

Re-design of src/UFEMISM/global_forcings/global_forcings_main.f90:
prescribed-constant or time-series (from file) CO2 and sea level, shared
by all model regions.
"""

from __future__ import annotations

import numpy as np

from ..io.ncio import NCFile


class GlobalForcings:
    def __init__(self, C):
        self.C = C
        self.CO2 = getattr(C, "fixed_CO2_concentration", 280.0) \
            if self._has(C, "fixed_CO2_concentration") else 280.0
        self.sealevel = 0.0
        self._sl_series = None
        self._co2_series = None

        choice_sl = getattr(C, "choice_sealevel_model", "fixed") \
            if self._has(C, "choice_sealevel_model") else "fixed"
        self.choice_sealevel = choice_sl
        if choice_sl == "fixed" and self._has(C, "fixed_sealevel"):
            self.sealevel = C.fixed_sealevel
        elif choice_sl == "prescribed" and self._has(
                C, "filename_prescribed_sealevel"):
            self._sl_series = self._read_series(
                C.filename_prescribed_sealevel, "sealevel")

        # CO2 record (global_forcings_main.f90 'CO2_direct')
        if self._has(C, "choice_matrix_forcing") \
                and C.choice_matrix_forcing == "CO2_direct" \
                and getattr(C, "filename_CO2_record", ""):
            self._co2_series = self._read_series(
                C.filename_CO2_record, "CO2")

    @staticmethod
    def _has(C, k):
        try:
            getattr(C, k)
            return True
        except AttributeError:
            return False

    @staticmethod
    def _read_series(path, var):
        from ..io.ncio import find_field
        with NCFile(path) as nc:
            t = find_field(nc, "time")
            v = find_field(nc, var)
        return (np.asarray(t), np.asarray(v))

    def update(self, time: float):
        """update_sealevel_at_model_time + CO2 at time."""
        if self._sl_series is not None:
            t, v = self._sl_series
            self.sealevel = float(np.interp(time, t, v))
        if self._co2_series is not None:
            t, v = self._co2_series
            self.CO2 = float(np.interp(time, t, v))
        return self
