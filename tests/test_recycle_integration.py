"""Integration of GCRO-DR recycling into the stepped NS solvers.

Short restart lengths force multiple Arnoldi cycles on a small fixture, so
the deflated chunk kernels and the cross-solve recycle carry actually
engage (at default restart lengths the small problems converge inside the
first plain cycle and the deflation never runs).
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.solvers import ns_solver


def _short_cycle_cfg():
    return dataclasses.replace(
        ProblemConfig(dim=2, num_refs=1, visc=0.05),
        ns=dataclasses.replace(
            ProblemConfig(dim=2, num_refs=1).ns,
            # restart/k ratio of 8 - the smallest at which the deflated
            # path engages (see the rl < 8*k guards); forward rl = 24,
            # adjoint rl = 48 (mult=2)
            lin_restart=24, lin_exec_chunk=8, adj_exec_restart=8,
            adj_recycle_k=3, lin_recycle_k=3,
        ),
    )


@pytest.fixture(scope="module")
def short_prob():
    cfg = _short_cycle_cfg()
    prob = ObstacleShapeOpt(cfg)
    X = prob.X0
    s, _, _, conv = prob._ns_solve(X, prob.initial_state(X))
    assert bool(conv)
    return prob, X, s


def test_recycled_stepped_adjoint_matches_monolithic(short_prob):
    prob, X, s = short_prob
    cfg = prob.cfg
    lam_m, _, _ = prob._adjoint_pre(X, s, jnp.zeros_like(s))
    nm = float(jnp.linalg.norm(lam_m))

    # first stepped solve: plain first cycle, deflated cycles after the
    # first recycle update (restart=12 forces many cycles)
    prob._cur_adj_U = None
    lam1, res1, it1 = prob._adjoint_stepped_fn(X, s, jnp.zeros_like(s))
    target = max(
        cfg.ns.lin_abs_tol,
        cfg.ns.adj_rel_tol * float(prob._adj_gj_norm(X, s)),
    )
    assert float(res1) <= 1.01 * target
    assert float(jnp.linalg.norm(lam1 - lam_m)) <= 1e-5 * nm
    # the solve populated a recycle space of the configured dimension
    assert prob._cur_adj_U is not None
    assert prob._cur_adj_U.shape[0] == cfg.ns.adj_recycle_k

    # second solve from scratch WITH the recycle space: same answer.  On
    # this tiny fixture the adjoint's preconditioned spectrum is BROAD
    # (full-restart GMRES needs ~an order more iterations than k), so
    # deflation cannot shrink the count - assert it does not blow it up
    # (the flagship evidence for the actual speedup is docs/ROADMAP.md
    # round-5: deflated cycle 2 at 200 vs 400 iterations)
    lam2, res2, it2 = prob._adjoint_stepped_fn(X, s, jnp.zeros_like(s))
    assert float(res2) <= 1.01 * target
    assert float(jnp.linalg.norm(lam2 - lam_m)) <= 1e-5 * nm
    assert int(it2) <= int(it1) * 1.3


def test_forward_recycle_carries_and_matches(short_prob):
    """The stepped forward Newton (verbose=True forces it on the small
    fixture) populates the model's recycle dict and converges to the same
    fixed point as the monolithic solve."""
    prob, X, s_conv = short_prob
    cfg = prob.cfg
    s0 = prob.initial_state(X)

    s_a, it_a, nrm_a, conv_a = prob._ns_solve(X, s0, verbose=True)
    assert bool(conv_a)
    assert prob._ns_recycle.get("U") is not None
    assert prob._ns_recycle["U"].shape[0] == cfg.ns.lin_recycle_k
    assert float(jnp.linalg.norm(s_a - s_conv)) <= 1e-6 * float(
        jnp.linalg.norm(s_conv)
    )
    # a second stepped solve consumes the recycle space (prepare path) and
    # still converges to the same state
    s_b, it_b, nrm_b, conv_b = prob._ns_solve(X, s0, verbose=True)
    assert bool(conv_b)
    assert float(jnp.linalg.norm(s_b - s_conv)) <= 1e-6 * float(
        jnp.linalg.norm(s_conv)
    )


def test_recycled_outer_step_accepts(short_prob):
    """One outer optimization step runs end-to-end with recycling on (the
    sidecar save/load path included)."""
    import tempfile

    prob, _, _ = short_prob
    with tempfile.TemporaryDirectory() as td:
        ckpt = f"{td}/ck.npz"
        hist = prob.run(num_steps=1, checkpoint_path=ckpt, verbose=False)
        assert len(hist) >= 1
        assert hist[0].drag_diff > 0  # descent step accepted
        import os

        assert os.path.exists(ckpt + ".warm.npz")
        # a fresh model restores the warm state without error; lam_adj is
        # always present, the recycle spaces iff the stepped solvers ran
        # on this prob (they did, in the earlier tests of this module)
        prob2 = ObstacleShapeOpt(_short_cycle_cfg())
        prob2._load_warm_sidecar(ckpt)
        assert prob2._cur_lam_adj is not None
        if prob._cur_adj_U is not None:
            assert prob2._cur_adj_U is not None
            assert prob2._cur_adj_U.shape == prob._cur_adj_U.shape
