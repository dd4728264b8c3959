"""End-to-end 2D shape optimization: drag must strictly decrease over
accepted steps, geometric constraints must hold on the deformed mesh, and
the gradient-norm bound must be respected."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import deformation as dfm
from admm_optim_tpu.ops.geometry import elem_geometry
from admm_optim_tpu.optim import admm


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def result():
    cfg = ProblemConfig(
        dim=2,
        num_refs=1,
        visc=0.05,
        sigma_threshold=0.3,
        admm=admm.ADMMConfig(admm_steps=40, ns_max_its=8, tau=2.0, lin_max_iters=120),
    )
    prob = ObstacleShapeOpt(cfg)
    hist = prob.run(num_steps=3, verbose=True)
    return prob, hist


def test_drag_decreases(result):
    prob, hist = result
    assert len(hist) == 3, f"only {len(hist)} accepted steps"
    drags = [h.drag for h in hist]
    assert all(d2 < d1 for d1, d2 in zip(drags, drags[1:])), drags
    # first step must also beat the undeformed drag
    s0 = prob.initial_state(prob.X0)
    s, _, _, conv = prob._ns_solve(prob.X0, s0)
    assert hist[0].drag < float(prob._drag(prob.X0, s))


def test_constraints_on_final_mesh(result):
    prob, hist = result
    X = prob.X_final
    # volume preserved vs the step-0 reference volume
    _, _, _, vol = elem_geometry(X, prob.elems)
    assert float(jnp.sum(vol)) == pytest.approx(float(prob.ref_volume), rel=1e-6)
    bary = dfm.barycenter(X, prob.elems, jnp.zeros_like(X.T))
    np.testing.assert_allclose(
        np.asarray(bary), np.asarray(prob.ref_barycenter), atol=1e-5
    )
    # mesh is untangled
    _, detJ, _, _ = elem_geometry(X, prob.elems)
    assert float(jnp.min(detJ)) > 0


def test_obstacle_actually_moved(result):
    prob, hist = result
    moved = jnp.linalg.norm(
        (prob.X_final - prob.X0) * prob.obstacle_vmask[:, None]
    )
    assert float(moved) > 1e-3
