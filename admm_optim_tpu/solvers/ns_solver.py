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
    # FGMRES restart length.  Too short STARVES the Krylov space when the
    # preconditioned spectrum stiffens: measured 3D refs=2 visc=0.05 on
    # v5e, restart=60 could not reduce the linear residual 1e-2 in 600
    # iterations (every Newton step burned the cap, outer |R| frozen at
    # 2.9e-2) while restart=200 converged the same solve in 3 Newton
    # iterations / 57 s.  Memory: the flexible basis stores 2*(restart+1)
    # state-sized vectors, so the EFFECTIVE restart is clamped from the
    # state size against lin_basis_budget_bytes (_restart_len) - a 200-long
    # basis on a >5M-dof state would otherwise be a multi-GB allocation.
    lin_restart: int = 200
    # memory budget for the FGMRES basis (2*(restart+1) state vectors);
    # ~4 GB leaves headroom next to the assembled Jacobian blocks on a
    # 16 GB v5e
    lin_basis_budget_bytes: float = 4e9
    lin_max_iters: int = 600
    # inexact-Newton forcing term: 1e-2 keeps the superlinear outer
    # trajectory (the abs floor tied to accept_tol supplies the final
    # accuracy) at ~2.3x fewer total GMRES iterations than 1e-5
    # (measured 2D refs=2 visc=0.05: 960 vs 2220, same 6-7 Newton steps,
    # same final |R| ~ 3e-9)
    lin_rel_tol: float = 1e-2
    lin_abs_tol: float = 1e-14
    # the ADJOINT solve is not an inexact-Newton step: the shape gradient
    # inherits its linear residual directly, so it keeps a tight tolerance
    # independent of lin_rel_tol
    adj_rel_tol: float = 1e-11
    # per-execution Arnoldi CHUNK length for the host-chunked adjoint
    # (large problems): the Arnoldi cycle is split over bounded device
    # executions with the basis device-resident between them
    # (krylov.gmres_chunk_*), so this bounds execution length WITHOUT
    # shortening the restart (the r3 design capped the restart itself at
    # this value, starving the Krylov space: the warm 3D refs=2 visc=0.02
    # adjoint burned its full 1000-iteration budget at restart 100).
    adj_exec_restart: int = 100
    # per-execution Arnoldi chunk length for the host-chunked FORWARD
    # Newton's linear solves (newton_solve_stepped): chunking the cycle
    # gives mid-cycle early exit on the lstsq residual estimate - the
    # monolithic cycle always ran its full restart length, overshooting by
    # up to restart-1 iterations per Newton step
    lin_exec_chunk: int = 50
    # GCRO-DR recycle-space dimension for the host-chunked ADJOINT solve
    # (krylov.gcro_*): harmonic Ritz vectors of the transposed Jacobian
    # carried across restart cycles AND across optimization steps (the
    # operator drifts slowly with the shape), deflating the slow modes
    # the restarted cycles kept re-discovering.  0 disables.
    adj_recycle_k: int = 24
    # same for the FORWARD stepped Newton's linear solves: the recycle
    # space is re-imaged per Newton iterate (k Jacobian applies - cheap
    # with the assembled blocks) and carried across iterates and, via the
    # caller's recycle dict, across optimization steps.  0 disables.
    lin_recycle_k: int = 16
    # relative stall threshold: stop Newton when an iteration reduces |R|
    # by less than this fraction.  A crawl below 0.1%/iteration never
    # reaches any tolerance (0.999^50 = 0.95 total) - it is the f32
    # residual floor.  Measured on the flagship stationarity tail
    # (3D refs=2 visc=0.02, warm start one step from the floor): the old
    # exact-equality guard (1e-14) let Newton burn 8 extra iterations
    # pinned at |R| = 3.73e-06, each paying the k-apply recycle re-image
    # plus a full acceptBest line search, ~140-160 s/solve; the relative
    # guard exits after one such iteration.
    stall_rtol: float = 1e-3


def _restart_len(cfg: NewtonConfig, n_state: int, itemsize: int,
                 mult: int = 1) -> int:
    """FGMRES restart length bounded by the basis memory budget (the
    flexible basis stores 2*(restart+1) state-sized vectors).  Floor of 30
    keeps the solver functional even when the budget is exceeded - at that
    point the basis is ~the size of a handful of states and unavoidable."""
    cap = int(cfg.lin_basis_budget_bytes // max(2 * n_state * itemsize, 1)) - 1
    return max(30, min(mult * cfg.lin_restart, cap))


def _chunked_rl(cfg: NewtonConfig, n_state: int, itemsize: int) -> int:
    """Restart length for the host-chunked forward solve: the budgeted
    _restart_len rounded down to whole lin_exec_chunk executions (the
    chunk kernel has a static trip count)."""
    ch = max(1, int(cfg.lin_exec_chunk))
    rl = _restart_len(cfg, n_state, itemsize)
    return max(ch, (rl // ch) * ch)


def newton_solve(
    space, coords, s0, visc, stab=0.0, cfg: NewtonConfig = NewtonConfig(),
    M=None, M_builder=None, jac_builder=None, jv_fn=None,
):
    """Newton with backtracking acceptBest line search.  Returns
    (s, iters, res_norm, converged) - all jittable.

    M: optional preconditioner for the inner GMRES (e.g. the GMG block
    preconditioner from ns_gmg_M); defaults to the block-diagonal
    surrogate.  M_builder(s) -> M rebuilds the preconditioner at the
    CURRENT Newton iterate (traced into the loop body).  A preconditioner
    frozen at s0 goes stale as the convection field develops - measured on
    the 2D refs=2 channel at visc=0.05 it costs 3.8x the total GMRES
    iterations and drops Newton from quadratic to ~4x/step (the reference
    reassembles its GMG hierarchy every Newton step for the same reason,
    obstacle_optim_util.lua:46-68).

    jac_builder(coords, s, visc) -> jac_args with jv_fn(x, jac_args) -> Jx:
    assemble-once Jacobian per Newton iterate (ops.ns_patchjac lattice
    blocks - the reference's AssembledOperator strategy, 2d_admm.lua:271);
    default is the matrix-free jax.jvp per Krylov iteration."""

    def R(s):
        return nsops.ns_residual(space, coords, s, visc, stab)

    if M is None and M_builder is None:
        M = nsops.diag_preconditioner(space, coords, visc)

    def norm(x):
        return jnp.sqrt(jnp.vdot(x, x))

    def lin_solve(s, r):
        if jac_builder is not None and jv_fn is not None:
            jac_args = jac_builder(coords, s, visc)
            Jv = lambda x: jv_fn(x, jac_args)
        else:
            Jv = lambda x: jax.jvp(R, (s,), (x,))[1]
        res = gmres(
            Jv,
            -r,
            M=M_builder(s) if M_builder is not None else M,
            restart=_restart_len(cfg, r.size, r.dtype.itemsize),
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
        stalled = nrm_new >= nrm * (1.0 - cfg.stall_rtol)
        return (s_new, it + 1, nrm_new, stalled)

    nrm0 = norm(R(s0))
    s, it, nrm, stalled = jax.lax.while_loop(
        cond, bodyfn, (s0, jnp.array(0, jnp.int32), nrm0, jnp.array(False))
    )
    return s, it, nrm, nrm <= cfg.accept_tol


def newton_solve_stepped(
    space,
    coords,
    s0,
    visc,
    stab=0.0,
    cfg: NewtonConfig = NewtonConfig(),
    M_fn=None,
    m_args=(),
    step_jit_cache: dict | None = None,
    verbose: bool = False,
    pre_fn=None,
    recycle: dict | None = None,
    jac_builder=None,
    jv_fn=None,
    jv_from_m=False,
):
    """Host-stepped Newton: same semantics as newton_solve, but one Newton
    iteration per device execution (GMRES capped at cfg.lin_max_iters per
    iteration).

    Why: single monolithic Newton programs reach 130+ MB of generated code
    and multi-minute single executions, which proved unreliable through the
    TPU tunnel (worker resets) and compile minutes-slow; the per-iteration
    kernel is ~8x smaller, robust, and the host loop gives per-iteration
    ConvCheck telemetry (the reference prints each Newton step too,
    obstacle_optim_util.lua:71-97).  Cost: ~2 dispatch round-trips per
    iteration - negligible beyond toy sizes.

    M_fn(r, *m_args): preconditioner as a FUNCTION of runtime pytree args
    (not a closure - closed-over device arrays would be baked into the
    compiled kernel as constants and go stale when the geometry moves).
    pre_fn(s) -> m_args: rebuild the preconditioner data at each Newton
    iterate (see newton_solve's M_builder for why); overrides m_args after
    the first iteration.
    step_jit_cache: per-problem dict to reuse compiled kernels across calls.
    jac_builder/jv_fn: assemble-once Jacobian (see newton_solve) - the
    assembly is traced INTO the step kernel (one device execution still).
    jv_from_m=True instead takes the assembled blocks as the LAST element
    of m_args (so pre_fn assembles them once per iterate and the
    preconditioner can reuse them, e.g. for its B^T coupling).
    """
    default_M = M_fn is None
    use_jac = jv_fn is not None and (jac_builder is not None or jv_from_m)
    cache = step_jit_cache if step_jit_cache is not None else {}
    key = ("newton_step_v3", id(space), stab, cfg, default_M, use_jac, jv_from_m)

    if key not in cache:

        def _wiring(coords, s, visc, m_args):
            def R(ss):
                return nsops.ns_residual(space, coords, ss, visc, stab)

            if default_M:
                Mx = nsops.diag_preconditioner(space, coords, visc)
            else:
                Mx = lambda x: M_fn(x, *m_args)
            if use_jac:
                jac_args = (
                    m_args[-1] if jv_from_m else jac_builder(coords, s, visc)
                )
                Jv = lambda x: jv_fn(x, jac_args)
            else:
                Jv = lambda x: jax.jvp(R, (s,), (x,))[1]
            return R, Jv, Mx

        def lin_start(coords, s, visc, x, m_args):
            """Open one FGMRES cycle continuing from x (bounded device
            executions: the full cfg.lin_max_iters solve used to run in a
            single multi-minute execution, which the TPU tunnel reproducibly
            KILLS - worker 'crashed or restarted' at the nu=0.02 rung,
            rungs >= 0.04 fine.  The Arnoldi cycle is further split into
            lin_exec_chunk-step executions with the basis device-resident
            (krylov.gmres_chunk_*), which adds mid-cycle early exit)."""
            from .krylov import gmres_chunk_start

            R, Jv, _ = _wiring(coords, s, visc, m_args)
            rl = _chunked_rl(cfg, s.size, s.dtype.itemsize)
            return gmres_chunk_start(Jv, -R(s), x, rl)

        def lin_chunk(coords, s, visc, V, Z, H, beta, j0, m_args):
            from .krylov import gmres_chunk_arnoldi

            _, Jv, Mx = _wiring(coords, s, visc, m_args)
            return gmres_chunk_arnoldi(
                Jv, Mx, V, Z, H, beta, j0, min(cfg.lin_exec_chunk,
                                               _chunked_rl(cfg, s.size,
                                                           s.dtype.itemsize))
            )

        def lin_finish(x, Z, H, beta):
            from .krylov import gmres_chunk_finish

            return gmres_chunk_finish(x, Z, H, beta)

        def lin_prepare(coords, s, visc, U, m_args):
            from .krylov import gcro_prepare

            _, Jv, _ = _wiring(coords, s, visc, m_args)
            return gcro_prepare(Jv, U)

        def lin_start_defl(coords, s, visc, x, U, C, m_args):
            from .krylov import gcro_chunk_start

            R, Jv, _ = _wiring(coords, s, visc, m_args)
            rl = _chunked_rl(cfg, s.size, s.dtype.itemsize)
            return gcro_chunk_start(Jv, -R(s), x, U, C, rl)

        def lin_chunk_defl(coords, s, visc, C, V, Z, H, B, beta, j0, m_args):
            from .krylov import gcro_chunk_arnoldi

            _, Jv, Mx = _wiring(coords, s, visc, m_args)
            return gcro_chunk_arnoldi(
                Jv, Mx, C, V, Z, H, B, beta, j0,
                min(cfg.lin_exec_chunk,
                    _chunked_rl(cfg, s.size, s.dtype.itemsize)),
            )

        def lin_finish_defl(x, Z, H, B, beta, U):
            from .krylov import gcro_chunk_finish

            return gcro_chunk_finish(x, Z, H, B, beta, U)

        def ls_step(coords, s, visc, delta, nrm):
            def R(ss):
                return nsops.ns_residual(space, coords, ss, visc, stab)

            def ls_body(k, carry):
                best_s, best_nrm = carry
                lam = cfg.line_search_reduce**k
                s_try = s + lam * delta
                rt = R(s_try)
                nrm_t = jnp.sqrt(jnp.vdot(rt, rt))
                better = nrm_t < best_nrm
                return (
                    jnp.where(better, s_try, best_s),
                    jnp.where(better, nrm_t, best_nrm),
                )

            return jax.lax.fori_loop(
                0, cfg.line_search_steps, ls_body, (s, nrm)
            )

        def resnorm(coords, s, visc):
            r = nsops.ns_residual(space, coords, s, visc, stab)
            return jnp.sqrt(jnp.vdot(r, r))

        cache[key] = (
            jax.jit(lin_start), jax.jit(lin_chunk), jax.jit(lin_finish),
            jax.jit(ls_step), jax.jit(resnorm),
            jax.jit(lin_prepare), jax.jit(lin_start_defl),
            jax.jit(lin_chunk_defl), jax.jit(lin_finish_defl),
        )
    (start_fn, chunk_fn, finish_fn, ls_fn, resnorm_fn,
     prep_fn, start_defl_fn, chunk_defl_fn, finish_defl_fn) = cache[key]

    rl = _chunked_rl(cfg, s0.size, s0.dtype.itemsize)
    ch = min(max(1, int(cfg.lin_exec_chunk)), rl)
    nrm = float(resnorm_fn(coords, s0, visc))
    s = s0
    it = 0
    k_r = max(0, int(getattr(cfg, "lin_recycle_k", 0)))
    if rl < 8 * k_r:
        # harmonic Ritz directions from short cycles are noise; deflating
        # them can slow the restart path (see obstacle._adjoint_stepped)
        k_r = 0
    U_carry = recycle.get("U") if recycle is not None else None
    while nrm > cfg.abs_tol and it < cfg.max_iters:
        if pre_fn is not None and it > 0:
            m_args = pre_fn(s)
        # inexact-Newton target fixed from THIS iterate's residual
        target = max(cfg.lin_abs_tol, 0.1 * cfg.accept_tol,
                     cfg.lin_rel_tol * nrm)
        x = jnp.zeros_like(s)
        lin_its = 0
        beta_prev = None
        U = C = None
        if k_r > 0 and U_carry is not None and U_carry.shape[0] == k_r:
            # re-image the recycle space against THIS iterate's Jacobian
            # (k plain applies; charged to the linear budget)
            U, C = prep_fn(coords, s, visc, U_carry, m_args)
            lin_its += k_r
        while lin_its < cfg.lin_max_iters:
            if U is not None:
                x_p, V, Z, H, B, beta = start_defl_fn(
                    coords, s, visc, x, U, C, m_args
                )
            else:
                V, Z, H, beta = start_fn(coords, s, visc, x, m_args)
                B, x_p = None, x
            if float(beta) <= target:
                x = x_p
                break
            if beta_prev is not None and not (
                float(beta) < beta_prev * (1.0 - 1e-6)
            ):
                # restart cycle stagnated (f32 floor); the U-projection in
                # x_p never grows the residual beta was measured at
                x = x_p
                break
            beta_prev = float(beta)
            x = x_p
            j, est = 0, beta
            while j < rl and float(est) > target and lin_its < cfg.lin_max_iters:
                if U is not None:
                    V, Z, H, B, est = chunk_defl_fn(
                        coords, s, visc, C, V, Z, H, B, beta,
                        jnp.asarray(j, jnp.int32), m_args,
                    )
                else:
                    V, Z, H, est = chunk_fn(
                        coords, s, visc, V, Z, H, beta,
                        jnp.asarray(j, jnp.int32), m_args,
                    )
                j += ch
                lin_its += ch
            if U is not None:
                x = finish_defl_fn(x, Z, H, B, beta, U)
            else:
                x = finish_fn(x, Z, H, beta)
            if k_r > 0:
                from .krylov import gcro_update_recycle

                Un, Cn = gcro_update_recycle(U, C, V, Z, H, B, k_r, j)
                if Un.shape[0] == k_r:  # keep jitted kernel shapes stable
                    U, C = Un, Cn
        if U is not None:
            U_carry = U
        s_new, nrm_new = ls_fn(coords, s, visc, x, jnp.asarray(nrm, s0.dtype))
        nrm_new = float(nrm_new)
        if verbose:
            print(f"  newton {it}: |R| {nrm:.3e} -> {nrm_new:.3e} ({lin_its} lin)")
        stalled = nrm_new >= nrm * (1.0 - cfg.stall_rtol)
        s, nrm = s_new, nrm_new
        it += 1
        if stalled:
            break
    if recycle is not None:
        recycle["U"] = U_carry
    return (
        s,
        jnp.asarray(it, jnp.int32),
        jnp.asarray(nrm, s0.dtype),
        jnp.asarray(nrm <= cfg.accept_tol),
    )


def adjoint_solve(
    space, coords, s, visc, stab=0.0, cfg: NewtonConfig = NewtonConfig(), M=None,
    Jt_fn=None, x0=None,
):
    """Solve J(s)^T lambda = -dJ_drag/ds.  The reference assembles a separate
    adjoint discretization (ADMMNavierStokesAdjoint, 2d_admm.lua:286-332);
    the transposed-Jacobian solve is its exact discrete counterpart.

    Jt_fn: optional assembled transpose apply (ops.ns_patchjac lattice
    blocks with the einsum transposed); default is jax.vjp per iteration.
    x0: optional warm start (e.g. the previous optimization step's adjoint;
    the residual target is relative to |rhs|, so a warm start can only
    reduce iterations).

    Note: a GMG preconditioner built for J must be (approximately) symmetric
    to double as a J^T preconditioner - the vector-Laplacian V-cycle is.

    Returns (lambda, final residual norm, iterations)."""

    def R(ss):
        return nsops.ns_residual(space, coords, ss, visc, stab)

    if Jt_fn is not None:
        Jt = Jt_fn
    else:
        _, vjp = jax.vjp(R, s)
        Jt = lambda x: vjp(x)[0]
    gJ = jax.grad(lambda ss: nsops.drag(space, coords, ss, visc))(s)
    if M is None:
        M = nsops.diag_preconditioner(space, coords, visc)
    # target vs |rhs| (not |r0|), so warm starts keep the cold-start target
    tol = jnp.maximum(
        cfg.lin_abs_tol, cfg.adj_rel_tol * jnp.linalg.norm(gJ)
    )
    res = gmres(
        Jt,
        -gJ,
        x0=x0,
        M=M,
        restart=_restart_len(cfg, gJ.size, gJ.dtype.itemsize, mult=2),
        max_iters=4 * cfg.lin_max_iters,
        abs_tol=tol,
        rel_tol=0.0,
    )
    return res.x, res.res_norm, res.iters


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


def ns_gmg_precond_data(
    ns_space, pre_space, pre_struct, coords, visc, s=None, p2_iso=True,
    adjoint=False, with_transpose=False,
):
    """Assemble the data of the GMG block preconditioner for the NS Jacobian.

    The velocity GMG exploits the hierarchy invariant: the P2 velocity dofs
    on level L (vertices + edge midpoints) ARE the vertices of level L+1, so
    a P2 coefficient vector is bitwise a P1 field on the once-refined mesh
    (the classical "P1-iso-P2" spectral equivalence), and since P2 nodal
    coefficients are interpolatory the current velocity doubles as the P1
    advecting field for the per-level convection-diffusion operators.
    pre_space must be the P1VectorSpace over levels 0..L+1 built with the NS
    velocity Dirichlet subsets; its per-level jits keep TPU compiles small.

    s: optional frozen NS state - if given, the velocity block carries the
    convection term (essential at low viscosity; the reference's GMG smooths
    the full Jacobian too, obstacle_optim_util.lua:46-68).  adjoint=True
    negates the advecting field (transposed-convection surrogate).

    Returns (pre_data pytree, pdiag) to pass into ns_gmg_M."""
    if p2_iso:
        # level-(L+1) coordinates via the midpoint parents (old vertices
        # have parents (v, v), so this is uniformly 0.5*(x[p0]+x[p1]))
        parents_fine = pre_space.parents[-1]
        Xf = 0.5 * (coords[parents_fine[:, 0]] + coords[parents_fine[:, 1]])
    else:  # P1/P1 velocity space lives on the same level
        Xf = coords
    if s is None:
        pre_data = pre_space.assemble_mg(pre_struct, Xf, 0.0, visc, 0.0)
    else:
        w, _ = ns_space.unpack(s)
        w = -w if adjoint else w
        pre_data = pre_space.assemble_mg_convdiff(
            pre_struct, Xf, w, visc, with_transpose=with_transpose
        )
    pdiag = nsops.pressure_mass_lumped(ns_space, coords, visc)
    return pre_data, pdiag


def ns_gmg_precond_data_patch(
    ns_space, pre_ps, pre_struct_p, pre_tabs, base_dense_fn, parents_fine,
    coords, visc, s=None, p2_iso=True, adjoint=False,
):
    """Patch-backend (brick-lattice stencil) variant of ns_gmg_precond_data:
    the velocity-block convection-diffusion hierarchy assembles and smooths
    gather-free (ops.patchstencil), ~11x cheaper per operator application
    than the block-ELL SpMV at 3D scale.

    pre_ps/pre_struct_p/pre_tabs: PatchSet (over the once-refined hierarchy
    for P2 velocities), PatchMGStructure(smoother="jacobi"), level tables.
    base_dense_fn receives the (V0, 2d) stacked [coords | velocity] level-0
    data (the patch assembly carries geometry and the frozen advecting field
    through the same lattice array).
    """
    from ..ops import patchstencil as pst
    from ..ops.convdiff import convdiff_corner_mats
    from . import patch_mg as pmg

    if p2_iso:
        Xf = 0.5 * (coords[parents_fine[:, 0]] + coords[parents_fine[:, 1]])
    else:
        Xf = coords
    d = coords.shape[1]
    if s is None:
        w = jnp.zeros_like(Xf.T)
    else:
        w, _ = ns_space.unpack(s)
        w = -w if adjoint else w
    cw = jnp.concatenate([Xf.T, w], axis=0)  # (2d, V_fine)
    cw_p = pst.to_patch(pre_ps.fine, cw)
    pre_data = pmg.assemble_patch_mg_p(
        pre_ps, pre_struct_p, cw_p,
        lambda c: convdiff_corner_mats(c, visc),
        base_dense_fn, pre_tabs,
    )
    pdiag = nsops.pressure_mass_lumped(ns_space, coords, visc)
    return pre_data, pdiag


def patch_velocity_M(pre_ps, pre_struct_p, pre_data, iters: int = 1):
    """Velocity-block action zv ~= F^-1 rv on the patch backend; global
    (d, n_vel) in/out.  Fixed (Dirichlet) dofs pass through untouched,
    matching the identity rows the ELL bake_dirichlet gives mg.vcycle.

    iters > 1 runs V-cycle-preconditioned Richardson (z += V(b - A z)):
    a stronger velocity block trades cheap gather-free V-cycles for outer
    GMRES iterations whose cost is dominated by the matrix-free P2 jvp.
    Measured (2D refs=2 visc=0.02 PCD, iteration counts platform-
    independent): total outer iterations 1380 / 1020 / 840 at iters=1/2/3."""
    from ..ops import patchstencil as pst
    from . import patch_mg as pmg

    tab = pre_data.tabs[pre_ps.k]
    W = pre_data.W[-1]

    def zv_fn(rv):
        free = tab.free[None].astype(rv.dtype)
        b_p = pst.to_patch(pre_ps.fine, rv)
        bf = b_p * free
        z_p = pmg.vcycle_p(pre_struct_p, pre_data, bf)
        for _ in range(iters - 1):
            Az = pmg._apply(pre_ps, tab, W, z_p)
            z_p = z_p + pmg.vcycle_p(pre_struct_p, pre_data, (bf - Az) * free)
        z_p = z_p + b_p * (1.0 - free)
        return pst.from_patch(pre_ps.fine, z_p, rv.shape[1], mode="owner")

    return zv_fn


def ns_pcd_spaces(hier, do_nothing: bool = True):
    """Build the scalar pressure-space wiring for the PCD preconditioner.

    Pressure is P1 on the NS level itself (Taylor-Hood), so the space spans
    hier's own levels.  PCD boundary conditions (Kay-Loghin-Wathen): the
    pressure Poisson operator Ap carries Dirichlet rows where the flow
    LEAVES (outlet with do-nothing outflow; everywhere Dirichlet-velocity
    otherwise pins nothing, so fall back to the outlet subset regardless).

    Returns (p_space, p_struct)."""
    import dataclasses as _dc

    from ..ops.p1space import P1VectorSpace

    # inlet-Dirichlet measured best on the channel/obstacle problems (the
    # modern PCD recommendation: Dirichlet where flow ENTERS); outlet
    # variants converge but slower, and block-diagonal application stalls
    # entirely - see tests/test_ns.py::test_pcd_preconditioner
    p_space = P1VectorSpace.build(hier, dirichlet=("inlet",), ncomp=1)
    p_struct = _dc.replace(
        p_space.mg_structure(pre_smooth=2, post_smooth=2), smoother="jacobi"
    )
    return p_space, p_struct


def ns_pcd_precond_data(
    ns_space, p_space, p_struct, coords, visc, s=None, adjoint=False
):
    """Assemble the PCD (pressure convection-diffusion) Schur data.

    Kay-Loghin-Wathen: S^-1 ~ Mp^-1 Fp Ap^-1 with Ap the pressure
    Laplacian, Fp the pressure convection-diffusion operator at the frozen
    velocity, Mp the lumped pressure mass.  This replaces the lumped-mass/nu
    Stokes surrogate (pressure_mass_lumped) and keeps the Krylov iteration
    count viscosity-robust - the role ComponentGaussSeidel pressure
    smoothing plays in the reference's solver preset
    (obstacle_optim_util.lua:46-102).

    Returns (ap_data, fp_vals, mp_lumped) for ns_pcd_M."""
    import jax

    from ..ops import sparsity
    from ..ops.convdiff import convdiff_elem_mats
    from ..ops.geometry import elem_geometry

    d = ns_space.dim
    if s is None:
        w = jnp.zeros((d, ns_space.n_vel), coords.dtype)
    else:
        w, _ = ns_space.unpack(s)
        w = -w if adjoint else w
    # velocity at the P1 (vertex) nodes: P2 nodal coefficients are
    # interpolatory, and vertex dofs come first in the P2 numbering
    w_p1 = w[:, : ns_space.n_vertices]
    # Ap: pressure Laplacian (w=0 => no artificial diffusion), unit nu
    ap_data = p_space.assemble_mg_convdiff(
        p_struct, coords, jnp.zeros_like(w_p1), 1.0
    )
    # Fp: plain Galerkin pressure convection-diffusion at the frozen w
    pat = p_space.fine_pattern
    em = convdiff_elem_mats(
        coords, jnp.asarray(ns_space.elems), w_p1, visc, art_diff=False, ncomp=1
    )
    fp_vals = sparsity.assemble_values(pat, em)
    fp_vals = sparsity.bake_dirichlet(
        pat, fp_vals, jnp.asarray(p_space.fixed[-1])
    )
    # Mp: lumped pressure mass (NOT nu-scaled; Fp carries the physics)
    elems = jnp.asarray(ns_space.elems)
    _, _, _, vol = elem_geometry(coords, elems)
    mp = jax.ops.segment_sum(
        jnp.broadcast_to(vol[None, :] / (d + 1.0), elems.T.shape).reshape(-1),
        elems.T.reshape(-1),
        num_segments=ns_space.n_vertices,
    )
    return ap_data, fp_vals, jnp.maximum(mp, 1e-30)


def pcd_patch_tables(hier, ps, dtype=jnp.float32):
    """Level tables for the SCALAR pressure space on the level-k patchset,
    with the PCD inlet-Dirichlet free masks (ns_pcd_spaces) instead of the
    patchset's own.  Exchange/ownership tables are Dirichlet-independent,
    so only `free` is rebuilt from the level gids."""
    import dataclasses as _dc

    import numpy as _np

    from . import patch_mg as pmg

    tabs = pmg.make_level_tables(ps, dtype)
    out = []
    for l, lvl in enumerate(ps.levels):
        fixed = hier.levels[l].vertex_mask(("inlet",))
        free = _np.moveaxis(~fixed[_np.asarray(lvl.gid)], 0, -1)
        out.append(_dc.replace(tabs[l], free=jnp.asarray(free, dtype)))
    return out


def ns_pcd_precond_data_patch(
    ns_space, ps, p_struct_p, p_tabs, ap_base_dense_fn, coords, visc,
    s=None, adjoint=False,
):
    """Patch-backend (brick-lattice stencil) PCD Schur data: the pressure
    Poisson hierarchy Ap and the fine-level pressure convection-diffusion
    stencil Fp assemble gather-free on the level-k lattice (pressure P1
    dofs ARE the level-k lattice sites), replacing the block-ELL assembly
    + SpMV of ns_pcd_precond_data.  Returns (ap_data, W_fp, mp)."""
    from ..ops import patchstencil as pst
    from ..ops.convdiff import convdiff_corner_mats
    from . import patch_mg as pmg

    d = ns_space.dim
    if s is None:
        w = jnp.zeros((d, ns_space.n_vel), coords.dtype)
    else:
        w, _ = ns_space.unpack(s)
        w = -w if adjoint else w
    w_p1 = w[:, : ns_space.n_vertices]
    # Ap: unit-nu pressure Laplacian hierarchy (w=0 => art_diff adds 0)
    cw_ap = jnp.concatenate([coords.T, jnp.zeros_like(w_p1)], axis=0)
    ap_data = pmg.assemble_patch_mg_p(
        ps, p_struct_p, pst.to_patch(ps.fine, cw_ap),
        lambda c: convdiff_corner_mats(c, 1.0, ncomp=1),
        ap_base_dense_fn, p_tabs,
    )
    # Fp: plain Galerkin pressure convection-diffusion at the frozen w,
    # fine level only (applied once per preconditioner application)
    cw_fp = jnp.concatenate([coords.T, w_p1], axis=0)
    W_fp = pst.assemble_w(
        ps, ps.k, pst.to_patch(ps.fine, cw_fp),
        lambda c: convdiff_corner_mats(c, visc, art_diff=False, ncomp=1),
        free=p_tabs[-1].free,
    )
    mp = jnp.maximum(nsops.pressure_mass_lumped(ns_space, coords, 1.0), 1e-30)
    return ap_data, W_fp, mp


def pcd_schur_patch_M(ns_space, ps, p_struct_p, p_tabs, ap_data, W_fp, mp):
    """S^-1 ~= Mp^-1 Fp Ap^-1 on the patch backend; global (n_p,) in/out."""
    from ..ops import patchstencil as pst
    from . import patch_mg as pmg

    tab = p_tabs[-1]

    def S_inv(rp):
        rp_p = pst.to_patch(ps.fine, rp[None])
        free = tab.free[None].astype(rp_p.dtype)
        # Dirichlet rows of Ap and Fp are identity (the ELL bake_dirichlet
        # semantics): the PCD inlet constraint exists only INSIDE the Schur
        # surrogate - the true pressure rows are divergence rows, so the
        # fixed components must pass through, not vanish (a zeroed subspace
        # makes the preconditioner singular there and stalls GMRES)
        yp = pmg.vcycle_p(p_struct_p, ap_data, rp_p * free) + rp_p * (1.0 - free)
        z = pst.exchange_sum(ps.fine, pst.apply_w(ps, W_fp, yp), tab=tab)
        z = z + yp * (1.0 - free)
        zp = pst.from_patch(ps.fine, z, ns_space.n_pressure, mode="owner")
        return zp[0] / mp

    return S_inv


def ns_pcd_M(ns_space, pre_struct, pre_data, p_space, p_struct, ap_data,
             fp_vals, mp, coords=None, visc=None, stab=0.0, vel_M=None,
             bt_fn=None, schur_fn=None):
    """Block-TRIANGULAR NS preconditioner with a PCD Schur approximation.

    z_p = Mp^-1 Fp Ap^-1 r_p          (one scalar V-cycle for Ap^-1)
    z_v = F^-1 (r_v - B^T z_p)        (one conv-diff V-cycle for F^-1)

    The triangular coupling is essential: measured at visc=0.02 on the
    refs=2 channel, block-diagonal PCD stalls GMRES while the triangular
    form reaches residuals ~40x below the triangular lumped-mass surrogate
    (tests/test_ns.py::test_pcd_preconditioner).  The B^T z_p action uses
    the affine pressure dependence of the momentum residual:
    B^T z_p = R_mom(0, z_p) - R_mom(0, 0), exact, one residual evaluation
    (Dirichlet rows cancel in the difference).  Requires coords/visc; when
    omitted, falls back to the (weak) block-diagonal form.  bt_fn
    (ops.ns_patchjac.make_bt_fn closure over the assembled lattice blocks)
    replaces the residual-evaluation trick with a stored-sub-block einsum."""
    from ..ops import sparsity
    from ..solvers import mg as mgmod

    pat = p_space.fine_pattern if p_space is not None else None
    triangular = bt_fn is not None or (coords is not None and visc is not None)
    if bt_fn is not None:
        bt = bt_fn
    elif triangular:
        bt, _ = _bt_coupling(ns_space, coords, visc, stab, mp)

    def M(r):
        rv, rp = ns_space.unpack(r)
        if schur_fn is not None:
            zp = schur_fn(rp)  # patch-backend Mp^-1 Fp Ap^-1
        else:
            yp = mgmod.vcycle(p_struct, ap_data, rp)
            zp = sparsity.spmv_flat(pat, fp_vals, yp) / mp
        if triangular:
            rv = rv - bt(zp)
        if vel_M is not None:
            zv = vel_M(rv)
        else:
            zv = mgmod.vcycle(pre_struct, pre_data, rv.reshape(-1)).reshape(rv.shape)
        return ns_space.pack(zv, zp)

    return M


def _bt_coupling(ns_space, coords, visc, stab, pdiag_dtype_ref):
    """Closure computing the off-diagonal actions from the affine structure
    of the residual: B^T z_p (pressure-gradient into momentum rows) and
    B z_v (divergence into continuity rows), each one residual evaluation.
    Exact for any visc: the coupling blocks are viscosity-independent."""
    from ..ops import navier_stokes as nsops

    zero_v = jnp.zeros((ns_space.dim, ns_space.n_vel), pdiag_dtype_ref.dtype)
    zero_p = jnp.zeros((ns_space.n_pressure,), pdiag_dtype_ref.dtype)
    r_zero = nsops.ns_residual(
        ns_space, coords, ns_space.pack(zero_v, zero_p), visc, stab
    )

    def bt(zp):  # (n_p,) -> (d, n_vel)
        r_zp = nsops.ns_residual(
            ns_space, coords, ns_space.pack(zero_v, zp), visc, stab
        )
        out, _ = ns_space.unpack(r_zp - r_zero)
        return out

    def b(zv):  # (d, n_vel) -> (n_p,)
        r_zv = nsops.ns_residual(
            ns_space, coords, ns_space.pack(zv, zero_p), visc, stab
        )
        _, out = ns_space.unpack(r_zv - r_zero)
        return out

    return bt, b


def ns_gmg_M(ns_space, pre_struct, pre_data, pdiag, vel_M=None,
             coords=None, visc=None, stab=0.0, bt_fn=None):
    """Block preconditioner closure: velocity ~ one V-cycle on the
    nu-weighted conv-diff operator (on the once-refined P1 space), pressure
    ~ lumped mass / nu.  Replaces the reference's GMG+ComponentGaussSeidel
    NS preconditioner (obstacle_optim_util.lua:46-102).  vel_M overrides
    the velocity-block action (patch_velocity_M for the stencil backend).

    With coords/visc given the preconditioner is block-TRIANGULAR:
    z_p = Mp^-1 r_p, then z_v = F^-1 (r_v - B^T z_p), with B^T z_p obtained
    exactly from the affine pressure dependence of the momentum residual
    (one residual evaluation; same trick as ns_pcd_M).  Measured on the 2D
    refs=2 channel at visc=0.05: total GMRES iterations across the Newton
    solve drop ~1.6x vs the block-diagonal form at equal final residual."""
    from ..solvers import mg as mgmod

    triangular = bt_fn is not None or (coords is not None and visc is not None)
    if bt_fn is not None:
        bt = bt_fn
    elif triangular:
        bt, _ = _bt_coupling(ns_space, coords, visc, stab, pdiag)

    def M(r):
        rv, rp = ns_space.unpack(r)  # rv (d, n_vel) == P1 field on L+1
        zp = rp / pdiag
        if triangular:
            rv = rv - bt(zp)
        if vel_M is not None:
            zv = vel_M(rv)
        else:
            zv = mgmod.vcycle(pre_struct, pre_data, rv.reshape(-1)).reshape(rv.shape)
        return ns_space.pack(zv, zp)

    return M


def transpose_M(M, n_state, dtype=jnp.float32):
    """EXACT transpose of a linear preconditioner via jax.vjp - the adjoint
    system's preconditioner of choice.

    For any preconditioner M, spectra satisfy eig(J^T M^T) = eig((M J)^T)
    = eig(M J), so the exact M^T reproduces the forward solve's Krylov
    convergence on J^T.  Hand-built transpose surrogates (V-cycle on the
    negated-advection operator, Fp^T via Fp(-w)) measurably do NOT: the
    velocity V-cycle fails a <Mx,y> = <x,M^T y> check at O(1) relative
    error (the transpose of a Jacobi-smoothed V-cycle is not the V-cycle
    of the transposed operator), and GMRES on J^T stalls 4 orders above
    the forward solve with them.  With the vjp-exact transpose, measured
    2D refs=2 visc=0.05: 240 its to 4e-13 - identical to the forward
    solve, 18x fewer iterations than the diagonal surrogate."""
    _, vjp_fn = jax.vjp(M, jnp.zeros((n_state,), dtype))

    def MT(r):
        return vjp_fn(r)[0]

    return MT
