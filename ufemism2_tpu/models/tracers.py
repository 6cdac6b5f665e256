"""Lagrangian tracer tracking: englacial particles + age tracer.

TPU-native re-design of src/UFEMISM/tracer_tracking/: the reference keeps
per-process particle lists with MPI migration; here a fixed-capacity
particle buffer [n_max, ...] lives on device, advected with RK2 in the 3-D
velocity field. Point location uses a precomputed background-grid bucket
table (host-built, static per mesh) mapping positions to the nearest
triangle/vertex - O(1) device gathers instead of walking the mesh.
Dead particle slots are recycled for new surface-accumulation particles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh_data import MeshData


class ParticleState(NamedTuple):
    x: jnp.ndarray        # [nP]
    y: jnp.ndarray
    zeta: jnp.ndarray     # [nP] scaled vertical position
    t_origin: jnp.ndarray  # [nP] deposition time
    alive: jnp.ndarray    # [nP] bool


class PointLocator:
    """Background-grid bucket table for O(1) point location on device."""

    def __init__(self, mesh, n_cells=256):
        from scipy.spatial import cKDTree
        self.xmin, self.xmax = mesh.xmin, mesh.xmax
        self.ymin, self.ymax = mesh.ymin, mesh.ymax
        self.n = n_cells
        gx = np.linspace(mesh.xmin, mesh.xmax, n_cells)
        gy = np.linspace(mesh.ymin, mesh.ymax, n_cells)
        X, Y = np.meshgrid(gx, gy, indexing="ij")
        pts = np.stack([X.ravel(), Y.ravel()], 1)
        _, tri = cKDTree(mesh.TriGC).query(pts)
        _, vtx = cKDTree(mesh.V).query(pts)
        self.tri_table = jnp.asarray(tri.reshape(n_cells, n_cells),
                                     jnp.int32)
        self.vtx_table = jnp.asarray(vtx.reshape(n_cells, n_cells),
                                     jnp.int32)

    def locate(self, x, y):
        """(tri, vtx) indices for positions (x, y)."""
        ix = jnp.clip(((x - self.xmin) / (self.xmax - self.xmin)
                       * (self.n - 1)).astype(jnp.int32), 0, self.n - 1)
        iy = jnp.clip(((y - self.ymin) / (self.ymax - self.ymin)
                       * (self.n - 1)).astype(jnp.int32), 0, self.n - 1)
        return self.tri_table[ix, iy], self.vtx_table[ix, iy]


def make_tracer_stepper(C, md: MeshData, locator: PointLocator,
                        n_particles: int = 4096):
    """Build (init_state, step) for the particle tracker."""
    zeta = md.zeta
    nz = md.nz

    def sample_velocity(s, p: ParticleState):
        tri, vtx = locator.locate(p.x, p.y)
        # vertical interpolation of u,v at particle zeta
        k = jnp.clip(jnp.searchsorted(zeta, p.zeta) - 1, 0, nz - 2)
        w = jnp.clip((p.zeta - zeta[k]) / (zeta[k + 1] - zeta[k]), 0, 1)
        u = s.u_3D_b[tri, k] * (1 - w) + s.u_3D_b[tri, k + 1] * w
        v = s.v_3D_b[tri, k] * (1 - w) + s.v_3D_b[tri, k + 1] * w
        Hi = s.Hi[vtx]
        dHi_dt = s.dHi_dt[vtx]
        return u, v, Hi, dHi_dt, vtx

    def step(p: ParticleState, s, dt, time):
        """RK2 advection + vertical zeta update + respawn at the surface."""
        u1, v1, Hi1, _, _ = sample_velocity(s, p)
        x_mid = p.x + 0.5 * dt * u1
        y_mid = p.y + 0.5 * dt * v1
        p_mid = p._replace(x=x_mid, y=y_mid)
        u2, v2, Hi2, dHdt2, vtx2 = sample_velocity(s, p_mid)
        x_new = p.x + dt * u2
        y_new = p.y + dt * v2

        # vertical motion: zeta increases as the surface accumulates above
        # the particle (burial); approximate w with -SMB-driven burial plus
        # thickness change (reference integrates w_3D; the zeta form keeps
        # particles consistent under thinning)
        Hi_safe = jnp.maximum(Hi2, 1.0)
        dzeta_dt = (1.0 - p.zeta) * dHdt2 / Hi_safe
        zeta_new = jnp.clip(p.zeta + dt * dzeta_dt, 0.0, 1.0)

        alive = p.alive & (Hi2 > 1.0) \
            & (x_new > locator.xmin) & (x_new < locator.xmax) \
            & (y_new > locator.ymin) & (y_new < locator.ymax)
        return ParticleState(x=jnp.where(alive, x_new, p.x),
                             y=jnp.where(alive, y_new, p.y),
                             zeta=jnp.where(alive, zeta_new, p.zeta),
                             t_origin=p.t_origin,
                             alive=alive)

    def spawn_at_surface(p: ParticleState, s, time, key):
        """Recycle dead slots as new surface particles on ice-covered
        vertices (create_particle_at_ice_surface)."""
        nP = p.x.shape[0]
        has_ice = s.Hi > 10.0
        # pick random ice vertices for dead slots
        idx = jax.random.randint(key, (nP,), 0, md.nV)
        ok = has_ice[idx] & ~p.alive
        V = md.V
        return ParticleState(
            x=jnp.where(ok, V[idx, 0], p.x),
            y=jnp.where(ok, V[idx, 1], p.y),
            zeta=jnp.where(ok, 0.0, p.zeta),
            t_origin=jnp.where(ok, time, p.t_origin),
            alive=p.alive | ok)

    def init_state(s, time=0.0):
        dtype = md.A.dtype
        return ParticleState(
            x=jnp.zeros(n_particles, dtype),
            y=jnp.zeros(n_particles, dtype),
            zeta=jnp.zeros(n_particles, dtype),
            t_origin=jnp.full(n_particles, time, dtype),
            alive=jnp.zeros(n_particles, bool))

    def particles_to_mesh(p: ParticleState, time):
        """Interpolate particle age onto the mesh (nearest-vertex binned
        mean; reference map_particles_to_mesh)."""
        _, vtx = locator.locate(p.x, p.y)
        age = time - p.t_origin
        w = p.alive.astype(age.dtype)
        num = jnp.zeros(md.nV, age.dtype).at[vtx].add(w * age)
        den = jnp.zeros(md.nV, age.dtype).at[vtx].add(w)
        return num / jnp.maximum(den, 1e-12), den > 0

    return init_state, step, spawn_at_surface, particles_to_mesh
