"""GCRO-DR subspace recycling (solvers/krylov.gcro_*).

The flagship adjoint re-solves a slowly-drifting transposed NS Jacobian
every optimization step; recycling the slow-mode subspace across restart
cycles and across solves is the iteration-count lever (docs/ROADMAP.md
round-5).  These tests pin the math on small dense systems where the exact
behavior is checkable:

  - invariants: A U^T == C^T, C row-orthonormal, C ⊥ V;
  - the deflated cycle's lstsq estimate equals the true residual;
  - a deflated solve converges to the same solution as plain GMRES;
  - recycling across a sequence of nearby systems cuts iterations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.solvers import krylov


def _mk_system(n=144, seed=0, n_small=6):
    """Nonsymmetric matrix with a cluster of small eigenvalues (the modes
    restarted GMRES struggles with)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    evals = np.concatenate([
        np.linspace(0.01, 0.06, n_small),          # small cluster
        np.linspace(1.0, 2.0, n - n_small),
    ])
    A = Q @ np.diag(evals) @ Q.T
    # nonsymmetric perturbation that keeps the spectrum's structure
    P = rng.standard_normal((n, n)) * 0.02
    A = A + P - P.T
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_gcro_invariants_and_estimate():
    Amat, b = _mk_system()
    A = lambda x: Amat @ x
    m, k = 24, 6
    # plain first cycle -> recycle space
    V, Z, H, beta = krylov.gmres_chunk_start(A, b, jnp.zeros_like(b), m)
    V, Z, H, est = krylov.gmres_chunk_arnoldi(
        A, lambda r: r, V, Z, H, beta, jnp.asarray(0, jnp.int32), m
    )
    x1 = krylov.gmres_chunk_finish(jnp.zeros_like(b), Z, H, beta)
    U, C = krylov.gcro_update_recycle(None, None, V, Z, H, None, k, m)
    assert U.shape[0] == k
    # invariant: A U^T == C^T, C row-orthonormal
    np.testing.assert_allclose(
        np.asarray(jax.vmap(A)(U)), np.asarray(C), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(C @ C.T), np.eye(k), atol=1e-9
    )
    # deflated cycle from x1
    x_p, V2, Z2, H2, B2, beta2 = krylov.gcro_chunk_start(A, b, x1, U, C, m)
    # the projection can only reduce the residual
    assert float(beta2) <= float(krylov._norm(b - A(x1))) + 1e-12
    V2, Z2, H2, B2, est2 = krylov.gcro_chunk_arnoldi(
        A, lambda r: r, C, V2, Z2, H2, B2, beta2, jnp.asarray(0, jnp.int32), m
    )
    # C stays orthogonal to the new Arnoldi basis
    assert float(jnp.abs(C @ V2[:m].T).max()) < 1e-8
    x2 = krylov.gcro_chunk_finish(x_p, Z2, H2, B2, beta2, U)
    # the lstsq estimate is the true residual (exact arithmetic, f64)
    np.testing.assert_allclose(
        float(est2), float(krylov._norm(b - A(x2))), rtol=1e-6, atol=1e-10
    )


def test_gcro_solve_matches_plain_gmres_solution():
    Amat, b = _mk_system(seed=3)
    A = lambda x: Amat @ x
    res, U = krylov.gcro_solve(
        A, b, restart=24, max_iters=400, abs_tol=1e-10, recycle_k=8
    )
    assert bool(res.converged)
    x_ref = jnp.linalg.solve(Amat, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-7)
    assert U is not None and U.shape[0] == 8


def test_gcro_deflation_beats_plain_restarts():
    """Within ONE hard system, deflated restarts converge where plain
    restarted GMRES of the same restart length stagnates or lags."""
    Amat, b = _mk_system(n=200, seed=1, n_small=10)
    A = lambda x: Amat @ x
    plain = krylov.gmres(A, b, restart=20, max_iters=400, abs_tol=1e-9)
    res, _ = krylov.gcro_solve(
        A, b, restart=20, max_iters=400, abs_tol=1e-9, recycle_k=10
    )
    assert bool(res.converged)
    assert int(res.iters) < int(plain.iters)


def test_gcro_recycling_across_nearby_systems():
    """The sequence use case: system t+1 is a small perturbation of system
    t (the adjoint operator across optimization steps).  With a recycled
    U0, later solves take fewer iterations than the cold first solve."""
    rng = np.random.default_rng(7)
    Amat, b = _mk_system(n=160, seed=5, n_small=8)
    iters = []
    U = None
    for t in range(3):
        At = Amat + jnp.asarray(rng.standard_normal(Amat.shape) * 1e-4)
        A = lambda x: At @ x
        res, U = krylov.gcro_solve(
            A, b, restart=20, max_iters=600, abs_tol=1e-9,
            recycle_k=10, U0=U, chunk=4,
        )
        assert bool(res.converged)
        iters.append(int(res.iters))
    assert iters[1] < iters[0]
    assert iters[2] <= iters[1] * 1.25  # stays fast, no degradation


def test_gcro_prepare_reimages_exactly():
    Amat, b = _mk_system(n=96, seed=9)
    A = lambda x: Amat @ x
    _, U = krylov.gcro_solve(A, b, restart=16, max_iters=200,
                             abs_tol=1e-9, recycle_k=5)
    A2mat = Amat + 1e-3 * jnp.eye(96)
    A2 = lambda x: A2mat @ x
    U2, C2 = krylov.gcro_prepare(A2, U)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(A2)(U2)), np.asarray(C2), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(C2 @ C2.T), np.eye(5), atol=1e-9
    )


def test_gcro_solve_with_preconditioner():
    """Flexible path: M = a fixed approximate inverse; the recycled solve
    still returns the right answer."""
    Amat, b = _mk_system(n=128, seed=11)
    Minv = jnp.linalg.inv(Amat + 0.05 * jnp.eye(128))
    M = lambda r: Minv @ r
    A = lambda x: Amat @ x
    res, _ = krylov.gcro_solve(
        A, b, M=M, restart=12, max_iters=200, abs_tol=1e-10, recycle_k=4
    )
    assert bool(res.converged)
    x_ref = jnp.linalg.solve(Amat, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), atol=1e-7)
