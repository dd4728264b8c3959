"""Batched design sweeps (vmap over sigma schedules and geometries) and the
sharded training step (parallel layer) on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.models import sweep
from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import deformation as dfm
from admm_optim_tpu.optim import admm


@pytest.fixture(scope="module")
def prob():
    cfg = ProblemConfig(
        dim=2,
        num_refs=1,
        visc=0.05,
        admm=admm.ADMMConfig(admm_steps=80, ns_max_its=8, tau=2.0, lin_max_iters=100),
    )
    return ObstacleShapeOpt(cfg)


def _jp(prob):
    obs = prob.obstacle_vmask
    X = prob.X0
    Jp = -X / jnp.maximum(jnp.linalg.norm(X, axis=1, keepdims=True), 0.3)
    return (Jp * obs[:, None] * 0.15).T


@pytest.mark.slow
def test_sigma_sweep(prob):
    Jp = _jp(prob)
    sigmas = jnp.asarray([0.15, 0.25, 0.35, 0.45])
    states = sweep.sigma_sweep(prob, prob.X0, Jp, sigmas)
    assert states.u.shape[0] == 4
    ok = np.asarray(states.converged) & ~np.asarray(states.failed)
    assert ok.sum() >= 3, f"too few sweep lanes converged: {ok}"
    # each converged lane respects ITS sigma bound
    for b in range(4):
        if not ok[b]:
            continue
        mx = float(dfm.max_frobenius_norm(prob.X0, prob.elems, states.u[b]))
        assert mx <= float(sigmas[b]) * 1.05 + 1e-12
    # larger sigma allows larger deformation
    n0 = float(jnp.linalg.norm(states.u[0]))
    n3 = float(jnp.linalg.norm(states.u[-1]))
    assert n3 > n0


@pytest.mark.slow
def test_geometry_sweep(prob):
    Jp = _jp(prob)
    rng = np.random.default_rng(0)
    B = 3
    # small interior perturbations of the base geometry
    free = np.asarray(prob.free.T)  # (V, d)
    Xs = np.stack(
        [np.asarray(prob.X0) + 0.02 * rng.normal(size=prob.X0.shape) * free * (b > 0)
         for b in range(B)]
    )
    Jps = np.broadcast_to(np.asarray(Jp), (B,) + Jp.shape)
    states = sweep.geometry_sweep(prob, Xs, Jps, sigma=0.3)
    ok = np.asarray(states.converged) & ~np.asarray(states.failed)
    assert ok.all(), f"geometry sweep lanes failed: {ok}"
    # lane 0 is the unperturbed geometry: must match a direct solve
    mgdata = prob._assemble(prob.X0)
    st = prob._admm(mgdata, prob.X0, Jp, jnp.asarray(0.3), jnp.asarray(1.0))
    np.testing.assert_allclose(
        np.asarray(states.u[0]), np.asarray(st.u), rtol=1e-8, atol=1e-10
    )
