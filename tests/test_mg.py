"""Geometric multigrid: V-cycle-preconditioned Krylov on the deformation
operator must converge mesh-independently and match the dense solution."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.p1space import P1VectorSpace
from admm_optim_tpu.solvers import krylov, mg


def _hier2d(n):
    levels = [geomgen.channel_2d()]
    for _ in range(n):
        levels.append(refine(levels[-1]))
    return Hierarchy(levels)


@pytest.fixture(scope="module")
def setup2d():
    hier = _hier2d(3)
    space = P1VectorSpace.build(hier)
    struct = space.mg_structure()
    coords = jnp.asarray(hier.fine.coords)
    data = space.assemble_mg(struct, coords, c_eps=1.0, c_grad=1.0, c_mass=1.0)
    return hier, space, struct, data


def test_vcycle_reduces_residual(setup2d):
    hier, space, struct, data = setup2d
    rng = np.random.default_rng(0)
    free = space.free_mask().reshape(-1)
    b = jnp.asarray(rng.normal(size=free.shape)) * free
    pat = space.fine_pattern
    x = mg.vcycle(struct, data, b)
    r = b - sparsity.spmv_flat(pat, data.vals[-1], x)
    rate = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rate < 0.2, f"single V-cycle contraction too weak: {rate}"


@pytest.mark.slow
def test_mg_cg_matches_dense(setup2d):
    hier, space, struct, data = setup2d
    rng = np.random.default_rng(1)
    free = space.free_mask().reshape(-1)
    b = jnp.asarray(rng.normal(size=free.shape)) * free
    pat = space.fine_pattern

    A = lambda x: sparsity.spmv_flat(pat, data.vals[-1], x)
    M = mg.make_preconditioner(struct, data)
    res = krylov.cg(A, b, M=M, max_iters=60, abs_tol=1e-11)
    assert bool(res.converged)
    assert int(res.iters) < 25, f"MG-CG took {int(res.iters)} iterations"

    dense = np.asarray(sparsity.to_dense(pat, data.vals[-1]))
    x_ref = np.linalg.solve(dense, np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6, atol=1e-9)


@pytest.mark.slow
def test_mg_iterations_mesh_independent():
    """Iteration counts must not blow up with refinement depth."""
    its = []
    for n in [1, 2, 3]:
        hier = _hier2d(n)
        space = P1VectorSpace.build(hier)
        struct = space.mg_structure()
        coords = jnp.asarray(hier.fine.coords)
        data = space.assemble_mg(struct, coords, 1.0, 1.0, 1.0)
        free = space.free_mask().reshape(-1)
        rng = np.random.default_rng(2)
        b = jnp.asarray(rng.normal(size=free.shape)) * free
        pat = space.fine_pattern
        A = lambda x: sparsity.spmv_flat(pat, data.vals[-1], x)
        res = krylov.cg(A, b, M=mg.make_preconditioner(struct, data), max_iters=100, abs_tol=1e-10)
        assert bool(res.converged)
        its.append(int(res.iters))
    assert max(its) <= min(its) + 6, f"iterations grew with refinement: {its}"


def test_bicgstab_with_mg(setup2d):
    hier, space, struct, data = setup2d
    rng = np.random.default_rng(3)
    free = space.free_mask().reshape(-1)
    b = jnp.asarray(rng.normal(size=free.shape)) * free
    pat = space.fine_pattern
    A = lambda x: sparsity.spmv_flat(pat, data.vals[-1], x)
    res = krylov.bicgstab(A, b, M=mg.make_preconditioner(struct, data), max_iters=60, abs_tol=1e-11)
    assert bool(res.converged)
    assert int(res.iters) < 20


def test_chebyshev_polynomial_is_optimal(monkeypatch):
    """The realized smoothing polynomial must match the true Chebyshev
    error factor 1/cosh(k*acosh(sigma)) on the target interval (regression
    for the rho-recurrence seed: the former theta/delta seed realized a
    non-Chebyshev polynomial - error factor 1.0 at degree 2, i.e. no
    damping at all, and 0.43 vs optimal 0.074 at degree 3)."""
    lower, lmax = 0.25, 1.0
    lams = jnp.linspace(lower * lmax, lmax, 201)
    # diagonal operator via a monkeypatched spmv: A = diag(lams)
    monkeypatch.setattr(
        mg.sparsity, "spmv_flat", lambda pat, vals, x: vals * x
    )
    b = lams * 1.0  # exact solution = ones
    x = mg.chebyshev_smooth(
        None, lams, jnp.ones_like(lams), lmax, jnp.zeros_like(lams), b,
        degree=3, lower=lower,
    )
    worst = float(jnp.max(jnp.abs(1.0 - x)))
    sigma = (lmax + lower * lmax) / (lmax - lower * lmax)
    optimal = 1.0 / float(np.cosh(3 * np.arccosh(sigma)))
    assert worst < optimal * 1.05, (worst, optimal)

    x2 = mg.chebyshev_smooth(
        None, lams, jnp.ones_like(lams), lmax, jnp.zeros_like(lams), b,
        degree=2, lower=lower,
    )
    worst2 = float(jnp.max(jnp.abs(1.0 - x2)))
    optimal2 = 1.0 / float(np.cosh(2 * np.arccosh(sigma)))
    assert worst2 < optimal2 * 1.05, (worst2, optimal2)
