"""Trace-time collective context for sharded model steps.

TPU-native analogue of the reference's MPI_ALLREDUCE sprinkled through the
solvers (SURVEY §5.8): when the model step is traced inside a shard_map
over the 1-D device mesh, every global reduction (Krylov dot products,
viscosity-iteration L2 norms, the pc truncation-error max, the advective
CFL min) must combine partial results across devices with lax.psum/pmax/
pmin. Outside shard_map the same call sites reduce locally.

The axis name is a *trace-time* property: `axis_ctx(name)` is entered
around the body of the shard_map'ed function, so all reductions traced
within pick up the collective. Single-device code never enters the
context and pays nothing.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_AXIS: list = [None]


@contextmanager
def axis_ctx(name: str):
    """Activate collective reductions over `name` for code traced inside."""
    _AXIS.append(name)
    try:
        yield
    finally:
        _AXIS.pop()


def axis():
    return _AXIS[-1]


def gsum(x):
    """Global sum of a local scalar/array (elementwise across devices)."""
    a = _AXIS[-1]
    return jax.lax.psum(x, a) if a is not None else x


def gmax(x):
    a = _AXIS[-1]
    return jax.lax.pmax(x, a) if a is not None else x


def gmin(x):
    a = _AXIS[-1]
    return jax.lax.pmin(x, a) if a is not None else x


def sum_all(x):
    """Global sum over ALL elements of a (possibly sharded) array."""
    return gsum(x.sum())


def max_all(x):
    return gmax(x.max())


def min_all(x):
    return gmin(x.min())


def dot(a, b):
    """Global dot product over pytrees of (sharded) arrays."""
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return gsum(sum((x * y).sum() for x, y in zip(la, lb)))


def norm(x):
    """Global L2 norm of a pytree."""
    return jnp.sqrt(dot(x, x))


# ---------------------------------------------------------------------------
# Halo exchange tables (this device's slice; see parallel/dist.py builder)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class HaloTables:
    """Per-device halo-exchange tables for one entity space.

    Flat layout so that, passed through shard_map with the leading axis
    sharded, each device receives exactly its own rows:
      send_idx/send_mask: [Hs] local indices this device contributes
      recv_map/recv_mask: [Hh] slots into the concatenated [P*Hs] buffer
    The extended local vector is [x_own ; halo] of length nL + Hh.
    """

    def __init__(self, send_idx, send_mask, recv_map, recv_mask):
        self.send_idx = send_idx
        self.send_mask = send_mask
        self.recv_map = recv_map
        self.recv_mask = recv_mask

    def tree_flatten(self):
        return ((self.send_idx, self.send_mask,
                 self.recv_map, self.recv_mask), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def halo_extend(x, t: HaloTables):
    """Extend this device's local block [nL(,d...)] with halo values
    gathered from the other devices over ICI: one all_gather of the
    (small, surface-to-volume) send buffers, then a local gather.

    The reference's MPI_ISEND/IRECV halo exchange
    (halo_exchange_mod.f90:384-493) mapped onto an XLA collective.
    """
    a = _AXIS[-1]
    if a is None:
        raise RuntimeError("halo_extend outside a comm.axis_ctx shard_map")
    sm = t.send_mask.reshape(t.send_mask.shape + (1,) * (x.ndim - 1))
    send = jnp.where(sm, x[t.send_idx], 0)
    buf = jax.lax.all_gather(send, a)              # [P, Hs(, d...)]
    buf = buf.reshape((-1,) + x.shape[1:])         # [P*Hs(, d...)]
    rm = t.recv_mask.reshape(t.recv_mask.shape + (1,) * (x.ndim - 1))
    halo = jnp.where(rm, buf[t.recv_map], 0)
    return jnp.concatenate([x, halo], axis=0)
