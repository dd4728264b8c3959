"""-b2ndOrder (2d_admm.lua:86, 389-419) validation: the second-order
x-update term is the directional derivative of the frozen-(s, lambda) shape
gradient, realized by AD instead of the reference's hand-coded J'' element
integrals.  Checked against central finite differences, and driven through
one full optimization step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.optim import admm
from admm_optim_tpu.solvers import ns_solver

pytestmark = pytest.mark.slow


def _flow(prob):
    X = prob.X0
    s = prob.initial_state(X)
    s, _, _, conv = prob._ns_solve(X, s, visc=0.16)
    assert bool(conv)
    lam, _, _ = prob._adjoint(X, s)
    return X, s, lam


def test_jpp_directional_derivative_matches_fd():
    cfg = ProblemConfig(dim=2, num_refs=1, visc=0.16, b2nd_order=True)
    prob = ObstacleShapeOpt(cfg)
    X, s, lam = _flow(prob)

    def g(XX):  # the frozen shape gradient, exactly as _admm_impl freezes it
        return (
            ns_solver.shape_gradient(
                prob.ns_space, XX, s, lam, cfg.visc, cfg.stab,
                prob.obstacle_vmask,
            ).T
            * prob.free
        )

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=X.shape))
    hvp = jax.jvp(g, (X,), (v,))[1]
    eps = 1e-6
    fd = (g(X + eps * v) - g(X - eps * v)) / (2 * eps)
    err = float(jnp.linalg.norm(hvp - fd) / jnp.maximum(jnp.linalg.norm(fd), 1e-30))
    assert err < 1e-5, f"J'' hvp vs FD: rel err {err}"


def test_b2nd_order_step_runs():
    """One accepted optimization step with the J'' term active (hscaling=1,
    the reference's default when -b2ndOrder is set)."""
    cfg = ProblemConfig(
        dim=2, num_refs=1, visc=0.16, b2nd_order=True, high_order_scaling=1.0,
        admm=admm.ADMMConfig(admm_steps=20, ns_max_its=6, tau=2.0,
                             lin_max_iters=200),
    )
    prob = ObstacleShapeOpt(cfg)
    hist = prob.run(num_steps=1)
    assert len(hist) == 1
    assert hist[0].drag_diff > 0.0  # recorded |drag decrease|
