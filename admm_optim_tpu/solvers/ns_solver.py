"""Newton solver for steady NS + discrete adjoint + shape gradient.

Replaces the reference's ``util.oo.ns_solver`` (Newton, ConvCheck(50, 1e-12),
standard line search lambda*=0.9 up to 50 with acceptBest,
obstacle_optim_util.lua:46-102) and ``util.oo.adjoint_ns_solver``
(obstacle_optim_util.lua:104-138).  The inner linear solves use GMRES on the
matrix-free Jacobian (jax.jvp) / transposed Jacobian (jax.vjp) instead of
BiCGStab+GMG+ComponentGaussSeidel; preconditioning is the block-diagonal
surrogate from ops.navier_stokes (upgradeable, see docs/ROADMAP).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import navier_stokes as nsops
from .krylov import SolveResult, gmres


@dataclasses.dataclass(frozen=True)
class NewtonConfig:
    max_iters: int = 50
    abs_tol: float = 1e-12
    # acceptance threshold for the converged flag: the inner GMRES tolerance
    # bounds the reachable Newton residual, so demanding abs_tol exactly
    # causes spurious "diverged" verdicts at ~1e-8 (observed end-to-end);
    # the reference's outer logic only needs "solved well".
    accept_tol: float = 1e-7
    line_search_steps: int = 20
    line_search_reduce: float = 0.9
    lin_restart: int = 60
    lin_max_iters: int = 600
    lin_rel_tol: float = 1e-5
    lin_abs_tol: float = 1e-14


def newton_solve(space, coords, s0, visc, stab=0.0, cfg: NewtonConfig = NewtonConfig()):
    """Newton with backtracking acceptBest line search.  Returns
    (s, iters, res_norm, converged) - all jittable."""

    def R(s):
        return nsops.ns_residual(space, coords, s, visc, stab)

    M = nsops.diag_preconditioner(space, coords, visc)

    def norm(x):
        return jnp.sqrt(jnp.vdot(x, x))

    def lin_solve(s, r):
        Jv = lambda x: jax.jvp(R, (s,), (x,))[1]
        res = gmres(
            Jv,
            -r,
            M=M,
            restart=cfg.lin_restart,
            max_iters=cfg.lin_max_iters,
            # absolute floor tied to the Newton acceptance threshold: the
            # linear residual caps the reachable nonlinear residual, so a
            # purely relative inner tolerance stalls Newton one order above
            # its target (observed end-to-end at ~rel_tol*|r_warmstart|)
            abs_tol=max(cfg.lin_abs_tol, 0.1 * cfg.accept_tol),
            rel_tol=cfg.lin_rel_tol,
        )
        return res.x

    def line_search(s, delta, nrm0):
        """acceptBest backtracking: try lambda = reduce^k, keep the best."""

        def body(k, carry):
            best_s, best_nrm = carry
            lam = cfg.line_search_reduce ** k
            s_try = s + lam * delta
            nrm = norm(R(s_try))
            better = nrm < best_nrm
            best_s = jnp.where(better, s_try, best_s)
            best_nrm = jnp.where(better, nrm, best_nrm)
            return best_s, best_nrm

        return jax.lax.fori_loop(0, cfg.line_search_steps, body, (s, nrm0))

    def cond(state):
        s, it, nrm, stalled = state
        return (nrm > cfg.abs_tol) & (it < cfg.max_iters) & (~stalled)

    def bodyfn(state):
        s, it, nrm, _ = state
        r = R(s)
        delta = lin_solve(s, r)
        s_new, nrm_new = line_search(s, delta, nrm)
        stalled = nrm_new >= nrm * (1.0 - 1e-14)
        return (s_new, it + 1, nrm_new, stalled)

    nrm0 = norm(R(s0))
    s, it, nrm, stalled = jax.lax.while_loop(
        cond, bodyfn, (s0, jnp.array(0, jnp.int32), nrm0, jnp.array(False))
    )
    return s, it, nrm, nrm <= cfg.accept_tol


def adjoint_solve(space, coords, s, visc, stab=0.0, cfg: NewtonConfig = NewtonConfig()):
    """Solve J(s)^T lambda = -dJ_drag/ds.  The reference assembles a separate
    adjoint discretization (ADMMNavierStokesAdjoint, 2d_admm.lua:286-332);
    the transposed-Jacobian solve is its exact discrete counterpart."""

    def R(ss):
        return nsops.ns_residual(space, coords, ss, visc, stab)

    _, vjp = jax.vjp(R, s)
    Jt = lambda x: vjp(x)[0]
    gJ = jax.grad(lambda ss: nsops.drag(space, coords, ss, visc))(s)
    M = nsops.diag_preconditioner(space, coords, visc)
    res = gmres(
        Jt,
        -gJ,
        M=M,
        restart=2 * cfg.lin_restart,
        max_iters=4 * cfg.lin_max_iters,
        abs_tol=cfg.lin_abs_tol,
        rel_tol=cfg.lin_rel_tol * 1e-6,
    )
    return res.x, res.res_norm


def shape_gradient(space, coords, s, lam, visc, stab, obstacle_vmask):
    """J'(X) = d/dX [ J_drag + lambda^T R ] at fixed (s, lambda), masked to
    the obstacle surface.  Parity: Sensitivity assembly +
    SetZeroAwayFromSubset (2d_admm.lua:811-814)."""

    def L(X):
        return nsops.drag(space, X, s, visc) + jnp.vdot(
            lam, nsops.ns_residual(space, X, s, visc, stab)
        )

    g = jax.grad(L)(coords)
    return g * obstacle_vmask[:, None]
