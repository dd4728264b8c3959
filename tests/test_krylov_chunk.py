"""Host-chunked FGMRES == monolithic FGMRES, cycle for cycle.

The chunked Arnoldi (solvers.krylov.gmres_chunk_*) exists so the stepped
NS adjoint can keep its FULL restart length under the TPU tunnel's
bounded-execution constraint (docs/ROADMAP.md round-3); splitting a cycle
over several device executions must not change the arithmetic.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from admm_optim_tpu.solvers import krylov


def _problem(n=120, seed=0):
    rng = np.random.default_rng(seed)
    # nonsymmetric, diagonally dominant (GMRES territory)
    A = np.eye(n) * 4.0 + rng.normal(size=(n, n)) * 0.35
    b = rng.normal(size=n)
    Md = 1.0 / np.diag(A)
    An, bn = jnp.asarray(A), jnp.asarray(b)
    Mdn = jnp.asarray(Md)
    return (lambda x: An @ x), bn, (lambda r: Mdn * r)


def test_chunked_cycle_matches_monolithic():
    A, b, M = _problem()
    m = 24
    x0 = jnp.zeros_like(b)
    ref = krylov.gmres(A, b, x0=x0, M=M, restart=m, max_iters=m,
                       abs_tol=1e-30, rel_tol=0.0)

    V, Z, H, beta = krylov.gmres_chunk_start(A, b, x0, m)
    for j0 in range(0, m, 7):  # uneven chunking crosses every boundary case
        V, Z, H, est = krylov.gmres_chunk_arnoldi(
            A, M, V, Z, H, beta, j0, min(7, m - j0)
        )
    x = krylov.gmres_chunk_finish(x0, Z, H, beta)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-13)
    # the lstsq estimate after the full cycle equals the true residual
    true = float(jnp.linalg.norm(b - A(x)))
    assert abs(float(est) - true) / max(true, 1e-30) < 1e-6


def test_chunked_early_exit_estimate_is_true_residual():
    A, b, M = _problem(seed=3)
    m = 40
    x0 = jnp.zeros_like(b)
    V, Z, H, beta = krylov.gmres_chunk_start(A, b, x0, m)
    # fill only 10 of 40 columns, then close the cycle early
    V, Z, H, est = krylov.gmres_chunk_arnoldi(A, M, V, Z, H, beta, 0, 10)
    x = krylov.gmres_chunk_finish(x0, Z, H, beta)
    true = float(jnp.linalg.norm(b - A(x)))
    assert abs(float(est) - true) / max(true, 1e-30) < 1e-6
    # and it matches the monolithic solver at the same Krylov dimension
    ref = krylov.gmres(A, b, x0=x0, M=M, restart=10, max_iters=10,
                       abs_tol=1e-30, rel_tol=0.0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)


def test_chunked_under_jit_with_dynamic_offset():
    """The chunk function compiles ONCE and is reused for every j0 (the
    host driver's pattern: j0 is a traced argument)."""
    A, b, M = _problem(seed=5)
    m = 16
    x0 = jnp.zeros_like(b)

    @jax.jit
    def chunk(V, Z, H, beta, j0):
        return krylov.gmres_chunk_arnoldi(A, M, V, Z, H, beta, j0, 4)

    V, Z, H, beta = krylov.gmres_chunk_start(A, b, x0, m)
    for j0 in range(0, m, 4):
        V, Z, H, est = chunk(V, Z, H, beta, jnp.asarray(j0))
    x = krylov.gmres_chunk_finish(x0, Z, H, beta)
    ref = krylov.gmres(A, b, x0=x0, M=M, restart=m, max_iters=m,
                       abs_tol=1e-30, rel_tol=0.0)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-13)
