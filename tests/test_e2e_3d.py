"""End-to-end 3D shape optimization (coarse mesh): parity with the 3D driver
(3d_admm.lua) - 4 geometric constraints (volume + 3 barycenters), 9-component
dual tensor, Frobenius projection."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import deformation as dfm
from admm_optim_tpu.ops.geometry import elem_geometry
from admm_optim_tpu.optim import admm
from admm_optim_tpu.solvers import ns_solver


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def result():
    # budgets sized for step 1 on the deformed mesh at sigma=0.3: the 3D
    # failure convention halves SCALING (3d_admm.lua:1322), so the ADMM must
    # actually converge at the nominal sigma (measured: 31 iterations)
    cfg = ProblemConfig(
        dim=3,
        num_refs=0,
        visc=0.1,
        sigma_threshold=0.3,
        admm=admm.ADMMConfig(admm_steps=60, ns_max_its=10, tau=2.0, lin_max_iters=400),
        ns=ns_solver.NewtonConfig(lin_max_iters=1200, lin_restart=100),
    )
    prob = ObstacleShapeOpt(cfg)
    hist = prob.run(num_steps=2, verbose=True)
    return prob, hist


def test_drag_decreases_3d(result):
    prob, hist = result
    assert len(hist) == 2, f"only {len(hist)} accepted steps"
    drags = [h.drag for h in hist]
    assert all(d2 < d1 for d1, d2 in zip(drags, drags[1:])), drags


def test_constraints_3d(result):
    prob, hist = result
    X = prob.X_final
    _, detJ, _, vol = elem_geometry(X, prob.elems)
    # orientation is mixed by design (path-ordered Kuhn tets); no inversion
    # means every element keeps its ORIGINAL orientation sign
    _, det0, _, _ = elem_geometry(prob.X0, prob.elems)
    assert float(jnp.min(jnp.sign(det0) * detJ)) > 0
    assert float(jnp.sum(vol)) == pytest.approx(float(prob.ref_volume), rel=1e-6)
    bary = dfm.barycenter(X, prob.elems, jnp.zeros_like(X.T))
    np.testing.assert_allclose(
        np.asarray(bary), np.asarray(prob.ref_barycenter), atol=1e-5
    )
    # m = 1 + dim = 4 constraints (3d_admm.lua:614-632)
    assert prob.ref_barycenter.shape == (3,)


def test_obstacle_moved_3d(result):
    prob, hist = result
    moved = jnp.linalg.norm((prob.X_final - prob.X0) * prob.obstacle_vmask[:, None])
    assert float(moved) > 1e-4
