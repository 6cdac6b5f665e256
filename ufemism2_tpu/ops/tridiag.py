"""Batched tridiagonal (Thomas) solver.

TPU-native replacement for the reference's per-vertex LAPACK tridiagonal
solves in the thermodynamics (src/UPSY/basic/math_utilities/
tridiagonal_solver.f90): all nV vertical columns are solved simultaneously
with a lax.scan over the (small, static) vertical dimension - two scans of
length nz over [nV]-wide carries, which XLA vectorises across the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def thomas_batched(ldiag, diag, udiag, b):
    """Solve tridiagonal systems batched over leading axes.

    ldiag: [..., n-1], diag: [..., n], udiag: [..., n-1], b: [..., n]
    Returns x: [..., n]. No pivoting (the heat-equation systems are
    diagonally dominant).
    """
    n = diag.shape[-1]
    # move the system axis to the front for scan
    l = jnp.moveaxis(ldiag, -1, 0)
    d = jnp.moveaxis(diag, -1, 0)
    u = jnp.moveaxis(udiag, -1, 0)
    bb = jnp.moveaxis(b, -1, 0)

    # forward sweep: c'_k = u_k / (d_k - l_{k-1} c'_{k-1})
    #                d'_k = (b_k - l_{k-1} d'_{k-1}) / (d_k - l_{k-1} c'_{k-1})
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        lk, dk, uk, bk = inp
        denom = dk - lk * cp_prev
        denom = jnp.where(jnp.abs(denom) < 1e-300, 1e-300, denom)
        cp = uk / denom
        dp = (bk - lk * dp_prev) / denom
        return (cp, dp), (cp, dp)

    l_pad = jnp.concatenate([jnp.zeros_like(d[:1]), l], axis=0)
    u_pad = jnp.concatenate([u, jnp.zeros_like(d[:1])], axis=0)
    zeros = jnp.zeros_like(d[0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (zeros, zeros),
                                      (l_pad, d, u_pad, bb))

    # back substitution: x_k = d'_k - c'_k x_{k+1}
    def bwd(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return jnp.moveaxis(xs, 0, -1)


def zeta_tridiag_operators(zeta):
    """Tridiagonal d/dzeta and d2/dzeta2 coefficients on a nonuniform grid.

    Returns dict of (ldiag [nz-1], diag [nz], udiag [nz-1]) for both
    operators (interior rows only; boundary rows zero - BC rows overwrite
    them). Reference: mesh_zeta.f90 calc_zeta_operators_tridiagonal.
    """
    import numpy as np
    zeta = np.asarray(zeta)
    nz = len(zeta)
    l1 = np.zeros(nz - 1)
    d1 = np.zeros(nz)
    u1 = np.zeros(nz - 1)
    l2 = np.zeros(nz - 1)
    d2 = np.zeros(nz)
    u2 = np.zeros(nz - 1)
    for k in range(1, nz - 1):
        dm = zeta[k] - zeta[k - 1]
        dp = zeta[k + 1] - zeta[k]
        l1[k - 1] = -dp / (dm * (dm + dp))
        d1[k] = (dp - dm) / (dm * dp)
        u1[k] = dm / (dp * (dm + dp))
        l2[k - 1] = 2.0 / (dm * (dm + dp))
        d2[k] = -2.0 / (dm * dp)
        u2[k] = 2.0 / (dp * (dm + dp))
    return {"ddzeta": (l1, d1, u1), "d2dzeta2": (l2, d2, u2)}
