"""Demo model: the fields-framework reference implementation.

Re-design of src/UPSY/models/demo_model/ (demo_model.f90 +
demo_model_{a,b}.f90): a minimal model with two selectable variants that
exercises the whole model contract - metadata-registered state fields,
generic remap on mesh update, restart write/read - exactly what the
reference's demo model exists to demonstrate (and what its fields-
framework unit tests use as a fixture).

Variant 'a': diffusion of a scalar field on the mesh.
Variant 'b': advection of the same field by a solid-body rotation.
"""

from __future__ import annotations

from dataclasses import dataclass

import chex
import jax
import jax.numpy as jnp
import numpy as np

from ..core.fields import FieldMeta


@chex.dataclass
class DemoState:
    phi: jnp.ndarray     # [nV] the demo scalar field
    t: jnp.ndarray       # scalar model time


DEMO_FIELD_META = {
    "phi": FieldMeta("a", "", "-", "demo scalar field", "conservative"),
    "t": FieldMeta("0", "", "yr", "demo model time", "copy"),
}


@dataclass
class DemoModel:
    """create_demo_model(choice) equivalent: 'a' (diffusion) or 'b'
    (rotation advection)."""
    choice: str = "a"

    def initialise(self, md):
        """Gaussian bump initial condition."""
        V = np.asarray(md.V)
        r2 = (V[:, 0] ** 2 + V[:, 1] ** 2)
        L = max(float(np.abs(V).max()), 1.0)
        phi = jnp.asarray(np.exp(-r2 / (0.1 * L) ** 2), md.A.dtype)
        self.md = md
        self._step = self._make_step(md)
        return DemoState(phi=phi, t=jnp.asarray(0.0, md.A.dtype))

    def _make_step(self, md):
        choice = self.choice
        if choice == "a":
            @jax.jit
            def step(s: DemoState, dt):
                # neighbour-mean diffusion (stable explicit scheme)
                nbr = jnp.where(md.mask_C, s.phi[md.C], 0.0)
                n = jnp.maximum(md.mask_C.sum(axis=1), 1)
                lap = nbr.sum(axis=1) / n - s.phi
                return s.replace(phi=s.phi + 0.4 * dt * lap, t=s.t + dt)
            return step
        if choice == "b":
            V = jnp.asarray(md.V)
            omega = 2.0 * jnp.pi / 100.0

            @jax.jit
            def step(s: DemoState, dt):
                # semi-Lagrangian solid-body rotation: evaluate phi at the
                # back-rotated neighbour (nearest-vertex gather)
                ang = -omega * dt
                c, sn = jnp.cos(ang), jnp.sin(ang)
                xb = c * V[:, 0] - sn * V[:, 1]
                yb = sn * V[:, 0] + c * V[:, 1]
                d2 = ((V[md.C, 0] - xb[:, None]) ** 2
                      + (V[md.C, 1] - yb[:, None]) ** 2)
                d2 = jnp.where(md.mask_C, d2, jnp.inf)
                d2_self = (V[:, 0] - xb) ** 2 + (V[:, 1] - yb) ** 2
                best = jnp.argmin(d2, axis=1)
                cand = jnp.take_along_axis(md.C, best[:, None], 1)[:, 0]
                use_self = d2_self <= jnp.take_along_axis(
                    d2, best[:, None], 1)[:, 0]
                src = jnp.where(use_self, jnp.arange(md.nV), cand)
                return s.replace(phi=s.phi[src], t=s.t + dt)
            return step
        raise ValueError(f"unknown choice_demo_model '{self.choice}'")

    def run(self, s: DemoState, t_end: float, dt: float = 1.0):
        while float(s.t) < t_end - 1e-9:
            s = self._step(s, jnp.asarray(min(dt, t_end - float(s.t)),
                                          s.phi.dtype))
        return s

    def remap(self, s: DemoState, old_mesh, new_mesh, new_md):
        """Generic metadata-driven remap onto a new mesh (the framework
        contract demo_model_remap.f90 demonstrates)."""
        from ..remap.atlas import get_map
        M = get_map(old_mesh, new_mesh)
        phi_new = jnp.asarray(M @ np.asarray(s.phi), new_md.A.dtype)
        self.md = new_md
        self._step = self._make_step(new_md)
        return DemoState(phi=phi_new, t=s.t)

    def write_restart(self, path, mesh, s: DemoState):
        from ..io.ncio import NCFile
        from ..io.output_files import setup_mesh_in_file
        with NCFile(path, "w") as nc:
            setup_mesh_in_file(nc, mesh)
            nc.def_var("phi", ("vi",))
            nc.put("phi", np.asarray(s.phi))
            nc.h5.create_dataset("t", data=np.asarray(s.t))

    def read_restart(self, path, md):
        from ..io.ncio import NCFile
        with NCFile(path) as nc:
            phi = jnp.asarray(nc.read("phi"), md.A.dtype)
            t = jnp.asarray(nc.read("t"), md.A.dtype)
        return DemoState(phi=phi, t=t)
