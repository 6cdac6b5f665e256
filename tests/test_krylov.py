"""Krylov solver tests (reference analogue: ut_petsc.f90)."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from ufemism2_tpu.ops.krylov import bicgstab, cg, gmres
from ufemism2_tpu.ops.sparse import ell_from_csr
from ufemism2_tpu.ops.tridiag import thomas_batched, zeta_tridiag_operators


def _laplacian(n, diag=2.2):
    return sp.diags([np.full(n - 1, -1.0), np.full(n, diag),
                     np.full(n - 1, -1.0)], [-1, 0, 1]).tocsr()


def test_cg_spd():
    n = 500
    A = _laplacian(n)
    E = ell_from_csr(A)
    b = jnp.asarray(np.random.default_rng(0).normal(size=n))
    res = cg(lambda x: E @ x, b, rtol=1e-10, abstol=1e-12)
    assert bool(res.converged)
    assert np.linalg.norm(A @ np.asarray(res.x) - np.asarray(b)) < 1e-7


def test_bicgstab_nonsymmetric():
    n = 400
    rng = np.random.default_rng(1)
    A = _laplacian(n) + sp.diags([np.full(n - 1, 0.3)], [1])
    E = ell_from_csr(A.tocsr())
    b = jnp.asarray(rng.normal(size=n))
    res = bicgstab(lambda x: E @ x, b, rtol=1e-10, abstol=1e-12)
    assert bool(res.converged)
    assert np.linalg.norm(A @ np.asarray(res.x) - np.asarray(b)) < 1e-6


def test_gmres_pytree():
    n = 300
    A1 = _laplacian(n, 3.0)
    E = ell_from_csr(A1)
    rng = np.random.default_rng(2)
    b = (jnp.asarray(rng.normal(size=n)), jnp.asarray(rng.normal(size=n)))

    def A(uv):
        u, v = uv
        return (E @ u + 0.1 * v, E @ v - 0.1 * u)

    res = gmres(A, b, rtol=1e-9, abstol=1e-11)
    assert bool(res.converged)
    ru, rv = A(res.x)
    assert np.abs(np.asarray(ru) - np.asarray(b[0])).max() < 1e-5


def test_preconditioned_faster():
    n = 600
    d = np.linspace(1.0, 1000.0, n)
    A = sp.diags(d).tocsr() + 0.1 * _laplacian(n, 0.0)
    E = ell_from_csr(A.tocsr())
    b = jnp.asarray(np.ones(n))
    plain = gmres(lambda x: E @ x, b, rtol=1e-8, abstol=1e-10)
    M = jnp.asarray(1.0 / d)
    pre = gmres(lambda x: E @ x, b, M=lambda r: M * r, rtol=1e-8,
                abstol=1e-10)
    assert int(pre.n_iter) <= int(plain.n_iter)


def test_thomas_batched():
    rng = np.random.default_rng(3)
    B, n = 50, 12
    l = rng.normal(size=(B, n - 1)) * 0.3
    u = rng.normal(size=(B, n - 1)) * 0.3
    d = 2.0 + rng.random(size=(B, n))
    b = rng.normal(size=(B, n))
    x = np.asarray(thomas_batched(jnp.asarray(l), jnp.asarray(d),
                                  jnp.asarray(u), jnp.asarray(b)))
    for i in range(B):
        A = np.diag(d[i]) + np.diag(l[i], -1) + np.diag(u[i], 1)
        np.testing.assert_allclose(A @ x[i], b[i], atol=1e-10)


def test_zeta_tridiag_operators():
    zeta = np.linspace(0, 1, 12)
    ops = zeta_tridiag_operators(zeta)
    l1, d1, u1 = ops["ddzeta"]
    # derivative of linear function is exact on interior rows
    f = 3.0 * zeta + 1.0
    for k in range(1, 11):
        val = l1[k - 1] * f[k - 1] + d1[k] * f[k] + u1[k] * f[k + 1]
        assert abs(val - 3.0) < 1e-10


def test_bicgstab_identity_exact_halfstep():
    """A = I converges exactly at the BiCGSTAB half-step (s = 0); the
    omega step must not manufacture inf/NaN (regression: guarded division
    by 1e-300 poisoned x via inf-inf when tt == 0 under jit)."""
    import jax.numpy as jnp
    from ufemism2_tpu.ops.krylov import bicgstab
    n = 73
    b = jnp.full(n, 100.03, jnp.float64)
    x0 = jnp.full(n, 100.0, jnp.float64)
    res = bicgstab(lambda x: x, b, x0=x0, rtol=1e-8, abstol=1e-6)
    assert bool(jnp.isfinite(res.x).all())
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b), rtol=1e-12)


def test_polynomial_preconditioners_accelerate_gmres():
    """Chebyshev/Neumann polynomial preconditioners over a Jacobi base
    must (a) approximate A^-1 better with rising degree and (b) cut GMRES
    iteration counts on an ill-conditioned SPD system."""
    import jax.numpy as jnp
    from ufemism2_tpu.ops.krylov import (
        gmres, estimate_lambda_max, make_chebyshev_preconditioner,
        make_neumann_preconditioner)
    rng = np.random.default_rng(7)
    n = 300
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.linspace(0.02, 2.0, n)          # kappa = 100
    Amat = jnp.asarray((Q * lam) @ Q.T)
    A = lambda v: Amat @ v
    M = lambda v: v
    b = jnp.asarray(rng.standard_normal(n))

    lmax = estimate_lambda_max(A, b, 20)
    assert abs(float(lmax) - 2.0) < 0.2

    xex = np.linalg.solve(np.asarray(Amat), np.asarray(b))
    errs = []
    for deg in (1, 3, 6):
        Mc = make_chebyshev_preconditioner(A, M, deg, lmax, lam_ratio=100.0)
        errs.append(np.linalg.norm(np.asarray(Mc(b)) - xex))
    assert errs[2] < errs[1] < errs[0]

    base = gmres(A, b, rtol=1e-8, abstol=0.0, restart=40)
    cheb = gmres(A, b, M=make_chebyshev_preconditioner(A, M, 5, lmax),
                 rtol=1e-8, abstol=0.0, restart=40)
    neu = gmres(A, b, M=make_neumann_preconditioner(A, M, 3),
                rtol=1e-8, abstol=0.0, restart=40)
    assert bool(cheb.converged) and bool(neu.converged)
    assert int(cheb.n_iter) < int(base.n_iter) / 2
    np.testing.assert_allclose(np.asarray(cheb.x), xex, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(neu.x), xex, rtol=1e-5,
                               atol=1e-6)
