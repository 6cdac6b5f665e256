"""Model region: initialise from config, run the outer time loop.

Re-design of src/UFEMISM/main/UFEMISM_main_model.f90: the event-driven
component scheduler (each component has its own t_next) lives on host;
the per-step device work (PC ice dynamics, component models) are jitted
pure functions. Mesh building and remapping are host-side events.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.mesh_data import build_mesh_data
from ..core.ice.state import init_ice_state
from ..core.ice.pc import make_pc_step, interpolate_ice_to_time
from ..core.idealised_geometries import calc_idealised_geometry
from ..mesh import Mesh, build_mesh_from_config
from ..utils.logging_utils import routine, happy


@dataclass
class ModelRegion:
    C: Config
    name: str = "ANT"
    mesh: Optional[Mesh] = None
    time: float = 0.0

    def __post_init__(self):
        C = self.C
        with routine("initialise_model_region"):
            if self.mesh is None:
                with routine("setup_first_mesh"):
                    self.mesh = build_mesh_from_config(C, self.name)
            self.md = build_mesh_data(self.mesh)

            # initial geometry on the mesh vertices
            choice = getattr(C, f"choice_refgeo_init_{self.name}")
            if choice == "idealised":
                Hi, Hb, Hs, SL = calc_idealised_geometry(
                    self.mesh.V[:, 0], self.mesh.V[:, 1],
                    C.choice_refgeo_init_idealised, C)
                Hi = np.where(Hi < C.refgeo_Hi_min, 0.0, Hi)
            else:
                raise NotImplementedError(
                    "read_from_file initial geometry arrives with io layer")

            self.state = init_ice_state(self.md, Hi, Hb, SL, nz=C.nz,
                                        dt_init=C.dt_ice_min)
            self.pc_step = make_pc_step(C, self.md)
            # solve initial velocities once
            self.time = C.start_time_of_run
            self.state = self.state.replace(
                t_Hi_prev=jnp.asarray(float(self.time)),
                t_Hi_next=jnp.asarray(float(self.time)))
            self.n_dt_ice = 0

    def run_to(self, t_end: float, dt_max: Optional[float] = None,
               verbose: bool = False):
        """Run ice dynamics until t_end (run_model_region main loop)."""
        C = self.C
        dt_max = dt_max if dt_max is not None else C.dt_ice_max
        t0 = _time.perf_counter()
        with routine("run_model_region"):
            while self.time < t_end - 1e-9:
                if float(self.state.t_Hi_next) <= self.time + 1e-9:
                    self.state = self.pc_step(
                        self.state,
                        jnp.asarray(min(dt_max, t_end - float(self.state.t_Hi_next))))
                    self.n_dt_ice += 1
                self.time = min(float(self.state.t_Hi_next), t_end)
                if verbose and self.n_dt_ice % 200 == 0:
                    print(f"  t={self.time:12.2f} yr  dt={float(self.state.dt_ice):8.4f}  "
                          f"steps={self.n_dt_ice}")
        self.state = interpolate_ice_to_time(self.state, jnp.asarray(self.time))
        self.wallclock = _time.perf_counter() - t0
        return self.state
