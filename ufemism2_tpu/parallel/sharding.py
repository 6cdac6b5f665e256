"""Multi-chip mesh sharding over a jax.sharding.Mesh.

TPU-native replacement for the reference's MPI domain decomposition
(src/UPSY/basic/mpi_parallelisation/): the mesh's vertex/triangle/edge axes
are sharded over a 1-D device mesh ("mesh" axis), after renumbering the
mesh so each device's domain is spatially contiguous (the reference's
enforce_contiguous_process_domains, mesh_contiguous_domains.f90). Field
arrays carry NamedSharding; the connectivity gathers then induce
halo-exchange collectives which XLA schedules over ICI.

This is phase 1 (sharded-arrays + XLA-inserted collectives). Phase 2
(shard_map with explicit ppermute halo exchanges per halo table, reference
halo_exchange_mod.f90) builds on the same renumbering.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P


MESH_AXIS = "mesh"


def make_device_mesh(n_devices: int | None = None) -> JMesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(
            f"requested a {n}-device mesh but only {len(devs)} JAX devices "
            f"exist (set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n} BEFORE the first jax backend initialisation)")
    return JMesh(np.array(devs[:n]), (MESH_AXIS,))


def renumber_contiguous(mesh, n_parts: int):
    """Renumber mesh entities so each partition owns a contiguous index
    range with spatial locality (space-filling-curve ordering by Morton
    code; reference mesh_contiguous_domains.f90 renumbers by sweep).

    Returns (perm_V, perm_Tri, perm_E): new order = old index arrays.
    """
    def morton_order(P):
        x = P[:, 0] - P[:, 0].min()
        y = P[:, 1] - P[:, 1].min()
        nx = ((x / max(x.max(), 1e-30)) * 65535).astype(np.uint64)
        ny = ((y / max(y.max(), 1e-30)) * 65535).astype(np.uint64)

        def spread(v):
            v = (v | (v << 8)) & np.uint64(0x00FF00FF)
            v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
            v = (v | (v << 2)) & np.uint64(0x33333333)
            v = (v | (v << 1)) & np.uint64(0x55555555)
            return v
        code = spread(nx) | (spread(ny) << np.uint64(1))
        return np.argsort(code, kind="stable")

    return (morton_order(mesh.V), morton_order(mesh.TriGC),
            morton_order(mesh.E))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_spec(jmesh: JMesh, sharded: bool = True):
    """NamedSharding for a field with leading mesh-entity axis."""
    return NamedSharding(jmesh, P(MESH_AXIS) if sharded else P())


def shard_state(state, jmesh: JMesh):
    """Place every leading-mesh-axis array of an IceState on the device
    mesh, sharded over its first axis; scalars replicated.

    Arrays whose first axis is not divisible by n_devices are replicated
    (callers should build meshes padded to multiples; see
    build_padded_mesh_data).
    """
    n = jmesh.devices.size
    s_shard = shard_spec(jmesh, True)
    s_repl = shard_spec(jmesh, False)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 \
                and x.shape[0] >= n:
            return jax.device_put(x, s_shard)
        return jax.device_put(x, s_repl)
    return jax.tree_util.tree_map(place, state)


def replicate(tree, jmesh: JMesh):
    s_repl = shard_spec(jmesh, False)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s_repl), tree)
