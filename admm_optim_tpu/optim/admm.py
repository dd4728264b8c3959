"""The ADMM inner solver: x-update Newton with Schur-complement constraint
handling, z-update prox, dual ascent, and the sigma/scaling adaptation -
all as one jitted ``lax.while_loop`` nest.

Reference parity map (2d_admm.lua):
 * ADMM loop            -> admm_inner (2d:868-1253)
 * z-update + projection-> ops.deformation.z_update (2d:883-905)
 * x-update Newton      -> newton_xupdate (2d:926-1171): per iteration
     - L_u = A u + r_lin + Lambda^T dg/du;   H = A + Lambda^T d2g/du2
     - solve H*st = L_u                       (2d:951-960   "A.sigma=(-Lu)")
     - B_i = dg_i/du; t_i = H^-1 B_i          (2d:983-1019, batched here)
     - S_ij = B_i . t_j ;  DLambda = S^-1 (g - B^T st)   (2d:1021-1031)
     - Du = -st - sum_j DLambda_j t_j
       (algebraically identical to the reference's extra "large problem"
        GMG solve 2d:1040-1054 - we reuse the t_j instead; one fewer
        multigrid solve per Newton iteration)
     - convergence on |DLambda| / abs / rel defect norms (2d:1163-1169)
 * dual ascent          -> ops.deformation.dual_update (2d:1181-1185)
 * convergence + "fake convergence" scaling*=2 restart (2d:1226-1250)

The constant SPD operator A = a(.,.) + tau*(grad ., grad .) is assembled once
per geometry into a GMG hierarchy; Newton's Hessian adds the (low-rank-ish)
Lambda^T g'' term matrix-free via AD, so the V-cycle on A stays a uniformly
good preconditioner.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import deformation as dfm
from ..ops import sparsity
from ..solvers import krylov, mg


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    """Knobs, named after the reference CLI flags (2d_admm.lua:43-87)."""

    admm_steps: int = 100  # -admmSteps
    admm_tolerance: float = 1e-2  # -admm_tolerance
    admm_gradient_tolerance: float = 0.05  # -admm_gradient_tolerance
    tau: float = 1.0  # -tau
    sigma_threshold: float = 0.3  # -sigma_threshold
    scaling: float = 1.0  # -scaling
    step_length: float = 1.0  # -step_length
    norm_name: str = "frobenius"  # -normName
    ns_max_its: int = 10  # -nsMaxIts (x-update Newton)
    ns_tol: float = 1e-9  # -nsTol (on |DeltaLambda|)
    ns_abs_tol: float = 1e-12  # -nsAbsLuTol (on |Lu|)
    ns_abs_llambda_tol: float = 1e-12  # -nsAbsLlambdaTol (on |g|)
    ns_rel_tol: float = 1e-12  # -nsRelLuTol (on |Lu|/|Lu_0|)
    ns_rel_llambda_tol: float = 1e-12  # -nsRelLlambdaTol (on |g|/|g_0|)
    # -lambda_vol/-lambda_x/-lambda_y[/-lambda_z] (2d:70-72): warm start for
    # the geometric multipliers of each x-update Newton solve.  Empty = zeros
    # (the reference's effective behavior: its Lambda is zeroed at every
    # step-size-control restart, 2d:848; the CLI values only leak into the
    # first iteration's element discretizations, 2d:390/424/485)
    lambda_init: tuple = ()
    # ADMM over-relaxation alpha (Boyd et al. sec. 3.4.3; typically 1.4-1.8).
    # 1.0 = reference behavior (no relaxation).  q_hat = alpha*q + (1-alpha)*
    # grad(u^k) replaces q in the x-update RHS and the dual ascent; the fixed
    # point (grad u = q) is unchanged.  BEYOND the reference (PAPERS.md
    # retrieved ADMM-acceleration literature; measured on the 2D channel
    # fixture: alpha=1.4 gives -25% ADMM / -18% Krylov iterations)
    relax_alpha: float = 1.0
    lin_max_iters: int = 200
    lin_abs_tol: float = 1e-12
    lin_rel_tol: float = 1e-10
    # run the x-update's (1+m) Krylov solves sequentially (lax.map) instead
    # of vmapped: the constraint-HVP's AD temporaries carry XLA layouts
    # with up to 128x tile padding at large 3D lattices (measured refs=3:
    # ~10 live 1.3 GB padded temps under vmap -> OOM), and sequencing
    # bounds the peak at one solve's working set.  Wall-clock-neutral when
    # each solve saturates the chip.
    xsolve_sequential: bool = False
    # Krylov method for the x-update H-solves: "bicgstab" (the reference's
    # preset, robust to mild indefiniteness of H = A + Lambda.g'') or "cg"
    # (H is symmetric; CG does ONE apply + ONE V-cycle per iteration vs
    # BiCGStab's two of each - cheaper per iteration when H stays
    # positive-definite, which holds for the moderate |Lambda| the ADMM
    # produces)
    x_solver: str = "bicgstab"
    # stagnation acceptance for the x-update Krylov solves (f32 path): a
    # solve that misses lin_abs/rel_tol but reaches a relative residual
    # <= lin_accept_rel is still OK - in f32 the achievable BiCGStab floor
    # grows with mesh size (measured refined.ugx refs=3: stalls at ~1.4e-5
    # rel vs the 1e-7 preset, reporting failure and burning every
    # sigma-halving retry).  0 = strict (f64 semantics, the reference's
    # ConvCheck).  The NS solver's accept_tol plays the same role there.
    lin_accept_rel: float = 0.0
    c_eps: float = 1.0  # extension operator eps(u):eps(w) weight
    c_mass: float = 1.0  # extension operator u.w weight


def _lambda_init(cfg: ADMMConfig, m: int, dtype) -> jnp.ndarray:
    """Initial geometric multipliers (m,) from cfg.lambda_init (zeros if unset)."""
    if not cfg.lambda_init:
        return jnp.zeros(m, dtype)
    if len(cfg.lambda_init) != m:
        raise ValueError(
            f"lambda_init has {len(cfg.lambda_init)} entries, problem has m={m} constraints"
        )
    return jnp.asarray(cfg.lambda_init, dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ADMMState:
    """Carried state of the jitted ADMM loop."""

    u: jnp.ndarray  # (V, d) deformation iterate
    u_old: jnp.ndarray  # previous ADMM iterate (for u_diff / max-norm)
    lam: jnp.ndarray  # (E, d, d) piecewise-constant dual tensor
    q_proj: jnp.ndarray  # (E, d, d) projected gradient copy
    Lambda: jnp.ndarray  # (m,) geometric-constraint multipliers
    scaling: jnp.ndarray  # J' scaling (adapted on fake convergence)
    admm_it: jnp.ndarray  # ADMM iteration counter
    total_newton: jnp.ndarray  # accumulated Newton iterations
    total_lin_iters: jnp.ndarray  # accumulated Krylov iterations
    solver_iters: jnp.ndarray  # (1+m,) accumulated Krylov iterations per
    # solve slot [rhs, B_vol, B_x, B_y(, B_z)] - the reference's
    # sum_rhssolver/sum_b*solver counters (2d_admm.lua:1379-1381); its
    # "large problem" solve is eliminated algebraically here, so that
    # column is written as 0 by the telemetry layer
    converged: jnp.ndarray  # bool
    failed: jnp.ndarray  # bool (solver failure / max steps)
    u_diff_norm: jnp.ndarray
    lam_inc_norm: jnp.ndarray
    max_grad_norm: jnp.ndarray
    stats: jnp.ndarray  # (admm_steps, 6) per-iteration history:
    # [scaling, sigma, u_diff, lam_inc, max_grad, sigma - max_grad]
    # (column layout of __ADMMStats_step_N_.txt, reference 2d:1221-1223)

    def tree_flatten(self):
        return (
            (
                self.u,
                self.u_old,
                self.lam,
                self.q_proj,
                self.Lambda,
                self.scaling,
                self.admm_it,
                self.total_newton,
                self.total_lin_iters,
                self.solver_iters,
                self.converged,
                self.failed,
                self.u_diff_norm,
                self.lam_inc_norm,
                self.max_grad_norm,
                self.stats,
            ),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def initial_state(n_vertices, n_elems, dim, m, scaling, max_steps, dtype=jnp.float64):
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    return ADMMState(
        u=z(dim, n_vertices),
        u_old=z(dim, n_vertices),
        lam=z(dim, dim, n_elems),
        q_proj=z(dim, dim, n_elems),
        Lambda=z(m),
        scaling=jnp.asarray(scaling, dtype),
        admm_it=jnp.array(0, jnp.int32),
        total_newton=jnp.array(0, jnp.int32),
        total_lin_iters=jnp.array(0, jnp.int32),
        solver_iters=jnp.zeros(1 + m, jnp.int32),
        converged=jnp.array(False),
        failed=jnp.array(False),
        u_diff_norm=jnp.asarray(jnp.inf, dtype),
        lam_inc_norm=jnp.asarray(jnp.inf, dtype),
        max_grad_norm=jnp.asarray(0.0, dtype),
        stats=z(max_steps, 6),
    )


def l2_norm_p1(coords, elems, f):
    """sqrt(int |f|^2) for a P1 field f (C, V), exact via the element mass."""
    d = coords.shape[1]
    from ..ops.geometry import elem_geometry

    _, _, _, vol = elem_geometry(coords, elems)
    fe = f[:, elems.T]  # (C, nl, E)
    nl = d + 1
    mfac = ((jnp.ones((nl, nl)) + jnp.eye(nl)) / ((d + 1) * (d + 2))).astype(f.dtype)
    val = jnp.einsum("e,ij,cie,cje->", vol, mfac, fe, fe)
    return jnp.sqrt(jnp.maximum(val, 0.0))


def l2_norm_pc(coords, elems, T):
    """sqrt(int |T|^2) for a piecewise-constant tensor field (d, d, E)."""
    from ..ops.geometry import elem_geometry

    _, _, _, vol = elem_geometry(coords, elems)
    return jnp.sqrt(jnp.maximum(jnp.einsum("e,cde,cde->", vol, T, T), 0.0))


def newton_xupdate_ops(
    cfg: ADMMConfig,
    ops_,
    Jp_base,
    scaling,
    lam,
    q_proj,
    ref_volume,
    ref_barycenter,
    u0,
    Lambda0,
    extra_hvp=None,
    sols0=None,
):
    """Constrained Newton (KKT via dense m x m Schur complement) on any
    representation adapter (optim.spaces.GlobalOps / PatchOps).

    sols0: optional (1+m, ...) warm start for the st/t_i Krylov solves
    (e.g. the previous ADMM iteration's solutions).

    Returns (u, Lambda, newton_iters, lin_iters, lin_each, failed, sols,
    hist, debug_fields) where lin_each is the (1+m,) per-solve-slot Krylov
    iteration sum [rhs, B_vol, B_x, B_y(, B_z)], debug_fields is the last
    applied iteration's (Lu, rhs_large, du) field triple - the quantities
    the reference's -bDebugOutput dumps as ConsistentLu_step_N /
    RHSBigProb_N / delta_u VTUs (2d_admm.lua:962-1076); rhs_large =
    -(Lu + B.DeltaLambda) is the RHS of the reference's "large problem"
    (eliminated algebraically here) - and hist is the per-Newton-iteration
    history (ns_max_its, 4 + 1 + m):
    [norm_sum, |du|, |DLambda|, |Lu|, rhs_solve_iters, constraint_solve
    iters...] - the rows behind the reference's __NewtonStats_step_N_ /
    __NewtonIterations_step_N_ files (2d_admm.lua:1111-1120, 1256-1259).
    norm_sum is written as 0.0 for exact column parity (the reference
    stores a literal 0.0, 2d:1113).  The reference's sixth iteration
    column (LargeSolver) has no counterpart here: the "large problem"
    solve is eliminated algebraically (module docstring), so the writer
    emits 0 for it."""
    free = ops_.free
    m = Lambda0.shape[0]
    n_hist = 4 + 1 + m

    r_lin = scaling * Jp_base * free + ops_.tensor_rhs(lam - cfg.tau * q_proj)

    def make_hess_apply(u, Lambda):
        # assembled-Hessian fast path (PatchOps.hess_fn): the constraint
        # Hessian folds into the stencil once per Newton iterate, so each
        # Krylov matvec is ONE fused stencil apply (b2ndOrder's extra_hvp
        # lives outside the cell calculus and keeps the matvec-side form)
        if extra_hvp is None and hasattr(ops_, "hess_fn"):
            return ops_.hess_fn(u, Lambda, ref_volume, ref_barycenter)
        # (u, Lambda)-dependent HVP state precomputed ONCE per Newton
        # iterate (ops_.hvp_fn) - the HVP runs at every Krylov matvec
        hvp = ops_.hvp_fn(u, Lambda, ref_volume, ref_barycenter)

        def hess_apply(x):
            hx = ops_.A(x) + hvp(x)
            if extra_hvp is not None:
                hx = hx + extra_hvp(x * free) * free
            return hx

        return hess_apply

    def solve_h(u, Lambda, rhs_batch, x0_batch):
        """Batched SPD-ish solves H x = b, warm-started from the previous
        Newton iteration's solutions (H and the B_i change slowly between
        iterates, so the old st/t_i are good initial guesses; the absolute
        tolerance target is unchanged)."""
        hess_apply = make_hess_apply(u, Lambda)

        def one(b, x0):
            solver = krylov.cg if cfg.x_solver == "cg" else krylov.bicgstab
            res = solver(
                hess_apply,
                b,
                x0=x0,
                M=ops_.M,
                max_iters=cfg.lin_max_iters,
                abs_tol=cfg.lin_abs_tol,
                rel_tol=cfg.lin_rel_tol,
                dot=ops_.dot,
            )
            ok = res.converged
            if cfg.lin_accept_rel > 0.0:
                bn = jnp.sqrt(ops_.dot(b, b))
                ok = ok | (res.res_norm <= cfg.lin_accept_rel * bn)
            return res.x, res.iters, ok

        if cfg.xsolve_sequential:
            xs, its, convs = jax.lax.map(lambda a: one(*a), (rhs_batch, x0_batch))
        else:
            xs, its, convs = jax.vmap(one)(rhs_batch, x0_batch)
        return xs, its.astype(jnp.int32), jnp.all(convs)

    def cond(state):
        (u, Lambda, it, lin, lin_each, done, failed, dlam_norm, lu0, g0,
         sols_prev, hist, dbg) = state
        return (~done) & (~failed) & (it < cfg.ns_max_its)

    def body(state):
        (u, Lambda, it, lin, lin_each, done, failed, dlam_prev, lu0, g0,
         sols_prev, hist, dbg) = state
        # under vmap the loop body runs for ALL lanes until every lane's
        # cond is false; freeze lanes that are already done/failed
        active = (~done) & (~failed)
        g = ops_.constraints(u, ref_volume, ref_barycenter)
        B = ops_.constraint_grads(u, ref_volume, ref_barycenter)
        Lu = (ops_.A(u) + r_lin + jnp.tensordot(Lambda, B, axes=1)) * free
        if extra_hvp is not None:
            # -b2ndOrder: the J'' term is part of the x-update OPERATOR in
            # the reference (DeformationEquation set_second_order,
            # 2d_admm.lua:389), so its defect carries J''.u - the term must
            # appear in the stationarity residual, not only in hess_apply,
            # or Newton converges to the unmodified first-order point
            Lu = Lu + extra_hvp(u * free) * free

        rhs = jnp.concatenate([Lu[None], B], axis=0)  # (1+m, ...)
        sols, its_each, ok = solve_h(u, Lambda, rhs, sols_prev)
        nlin = jnp.sum(its_each).astype(jnp.int32)
        st, t = sols[0], sols[1:]  # st = H^-1 Lu ; t_i = H^-1 B_i

        # Schur assembly in ONE fused Gram pass: S = B.t^T and B.st together
        # (m*(2+m) pairings; separate dots re-stream B and the solutions
        # ~20x - measured 8.65 ms/dot at 3D refs=4 = 170 ms/Newton of pure
        # re-reads)
        G = ops_.dot_batch(B, sols)  # (m, 1+m): col 0 = B.st, cols 1: = S
        S = G[:, 1:]
        rhs_s = g - G[:, 0]
        dLambda = jnp.linalg.solve(S, rhs_s)
        du = -st - jnp.tensordot(dLambda, t, axes=1)

        # a failed Krylov solve must NOT contaminate the iterate: the
        # reference breaks out of the x-update before applying the update
        # (2d:960/988/1054 precede the VecScaleAdd2 at 2d:1068)
        apply = active & ok
        u_new = jnp.where(apply, (u + du) * free, u)
        Lambda_new = jnp.where(apply, Lambda + dLambda, Lambda)
        # -bDebugOutput fields (last applied iteration): the pre-update
        # defect Lu, the eliminated large problem's RHS, and the increment
        rhs_large = -(Lu + jnp.tensordot(dLambda, B, axes=1)) * free
        dbg = jax.tree_util.tree_map(
            lambda new_f, old_f: jnp.where(apply, new_f, old_f),
            (Lu, rhs_large, du), dbg,
        )

        # convergence (reference 2d:1163-1169): increment / abs / rel norms;
        # the relative test is against the FIRST iteration's norms
        # (Norm_Lu_0 / Norm_Llambda_0, 2d:1150-1154).  Matching the
        # reference's evaluation points: |Lu| is the PRE-update defect
        # (assembled at 2d:954, norm at 2d:1095) while the constraint norm
        # uses the UPDATED iterate (VolumeDefect(u) after u += delta_u,
        # 2d:1068/1122-1126)
        dlam_norm = jnp.sqrt(jnp.vdot(dLambda, dLambda))
        lu_norm = ops_.norm_p1(Lu)
        g_new = ops_.constraints(u_new, ref_volume, ref_barycenter)
        g_norm = jnp.sqrt(jnp.vdot(g_new, g_new))
        first = active & (it == 0)
        lu0 = jnp.where(first, lu_norm, lu0)
        g0 = jnp.where(first, g_norm, g0)
        tiny = jnp.asarray(jnp.finfo(u0.dtype).tiny, u0.dtype)
        rel_ok = (lu_norm / jnp.maximum(lu0, tiny) < cfg.ns_rel_tol) & (
            g_norm / jnp.maximum(g0, tiny) < cfg.ns_rel_llambda_tol
        )
        done = done | (
            apply
            & (
                (dlam_norm <= cfg.ns_tol)
                | ((lu_norm < cfg.ns_abs_tol) & (g_norm < cfg.ns_abs_llambda_tol))
                | rel_ok
            )
        )
        failed = failed | (active & ~ok)
        # per-iteration history row (reference 2d:1111-1120); stored only
        # when the update was applied, like the reference (solver failure
        # breaks out before the stats assignment)
        du_norm = ops_.norm_p1(du * free)
        row = jnp.concatenate(
            [
                jnp.stack([jnp.zeros_like(du_norm), du_norm, dlam_norm, lu_norm]),
                its_each.astype(du_norm.dtype),
            ]
        )
        slot = jnp.minimum(it, cfg.ns_max_its - 1)
        hist = jnp.where(apply, hist.at[slot].set(row), hist)
        it = jnp.where(active, it + 1, it)
        lin = jnp.where(active, lin + nlin, lin)
        lin_each = jnp.where(active, lin_each + its_each, lin_each)
        dlam_norm = jnp.where(apply, dlam_norm, dlam_prev)
        sols_out = jnp.where(apply, sols, sols_prev)
        return (u_new, Lambda_new, it, lin, lin_each, done, failed, dlam_norm,
                lu0, g0, sols_out, hist, dbg)

    init = (
        u0,
        Lambda0,
        jnp.array(0, jnp.int32),
        jnp.array(0, jnp.int32),
        jnp.zeros(1 + m, jnp.int32),
        jnp.array(False),
        jnp.array(False),
        jnp.asarray(jnp.inf, u0.dtype),
        jnp.asarray(0.0, u0.dtype),
        jnp.asarray(0.0, u0.dtype),
        jnp.zeros((1 + m,) + u0.shape, u0.dtype) if sols0 is None else sols0,
        jnp.zeros((cfg.ns_max_its, n_hist), u0.dtype),
        (jnp.zeros_like(u0), jnp.zeros_like(u0), jnp.zeros_like(u0)),
    )
    (u, Lambda, it, lin, lin_each, done, failed, _, _, _, sols, hist,
     dbg) = jax.lax.while_loop(cond, body, init)
    # not converging within ns_max_its counts as failure (reference 2d:1084-1090)
    failed = failed | (~done)
    return u, Lambda, it, lin, lin_each, failed, sols, hist, dbg


def newton_xupdate(
    cfg: ADMMConfig,
    struct: mg.MGStructure,
    mgdata: mg.MGData,
    coords,
    elems,
    free,  # (C, V) float mask
    Jp_base,  # (C, V) unscaled shape gradient (obstacle-masked)
    scaling,
    lam,
    q_proj,
    ref_volume,
    ref_barycenter,
    u0,
    Lambda0,
    extra_hvp=None,
):
    """Compatibility wrapper: global-representation Newton x-update."""
    from .spaces import GlobalOps

    ops_ = GlobalOps(struct, mgdata, coords, elems, free)
    r = newton_xupdate_ops(
        cfg, ops_, Jp_base, scaling, lam, q_proj, ref_volume, ref_barycenter,
        u0, Lambda0, extra_hvp=extra_hvp,
    )
    return r[0], r[1], r[2], r[3], r[5]


def admm_inner_ops(
    cfg: ADMMConfig,
    ops_,
    Jp_base,
    sigma_threshold,
    scaling0,
    ref_volume,
    ref_barycenter,
    extra_hvp=None,
):
    """Full ADMM loop for one optimization step on any representation
    adapter (jit-compatible).  Returns the final ADMMState."""
    dim = ops_.dim
    m = 1 + dim
    dtype = Jp_base.dtype
    lam0 = _lambda_init(cfg, m, dtype)
    zf = ops_.zeros_field(dtype)
    zt = ops_.zeros_tensor(dtype)
    state = ADMMState(
        u=zf,
        u_old=zf,
        lam=zt,
        q_proj=zt,
        Lambda=lam0,
        scaling=jnp.asarray(scaling0, dtype),
        admm_it=jnp.array(0, jnp.int32),
        total_newton=jnp.array(0, jnp.int32),
        total_lin_iters=jnp.array(0, jnp.int32),
        solver_iters=jnp.zeros(1 + m, jnp.int32),
        converged=jnp.array(False),
        failed=jnp.array(False),
        u_diff_norm=jnp.asarray(jnp.inf, dtype),
        lam_inc_norm=jnp.asarray(jnp.inf, dtype),
        max_grad_norm=jnp.asarray(0.0, dtype),
        stats=jnp.zeros((cfg.admm_steps, 6), dtype),
    )

    def cond(carry):
        st, _ = carry
        return (~st.converged) & (~st.failed) & (st.admm_it < cfg.admm_steps)

    def body(carry):
        st, xsols = carry
        active = (~st.converged) & (~st.failed)
        # ---- z-update + projection (2d:883-905) --------------------------
        q_proj = ops_.z_update(st.u, st.lam, cfg.tau, sigma_threshold, cfg.norm_name)
        if cfg.relax_alpha != 1.0:
            # over-relaxation: q_hat enters the x-update and dual ascent
            al = jnp.asarray(cfg.relax_alpha, q_proj.dtype)
            q_hat = al * q_proj + (1.0 - al) * ops_.grad_tensor(st.u)
        else:
            q_hat = q_proj
        max_norm = ops_.max_grad_norm(st.u_old, cfg.norm_name)

        # ---- x-update (2d:926-1171) --------------------------------------
        # multipliers carry across ADMM iterations as in the reference
        # (Lambda += DeltaLambda persists, 2d:1068-1142; it is only zeroed
        # at a step-size-control restart, 2d:848 = a fresh admm_inner call):
        # measured -18% Newton / -13% Krylov iterations vs a zero restart,
        # identical fixed point.  The st/t_i Krylov solutions also carry
        # (xsols) as warm starts for the next iteration's solves.
        (u, Lambda, nit, nlin, nlin_each, x_failed, xsols_new, _,
         _dbg) = newton_xupdate_ops(
            cfg, ops_, Jp_base, st.scaling, st.lam, q_hat,
            ref_volume, ref_barycenter,
            st.u, st.Lambda, extra_hvp=extra_hvp, sols0=xsols,
        )

        # ---- dual ascent (2d:1181-1185) ------------------------------------
        lam, lam_inc = ops_.dual_update(u, st.lam, q_hat, cfg.tau)

        u_diff_norm = ops_.norm_p1(u - st.u_old)
        lam_inc_norm = ops_.norm_pc(lam_inc)

        # ---- convergence logic (2d:1226-1250) ------------------------------
        base_conv = (
            (lam_inc_norm < cfg.admm_tolerance)
            & (u_diff_norm < cfg.admm_tolerance)
            & (sigma_threshold - max_norm > -cfg.admm_gradient_tolerance * sigma_threshold)
        )
        fake = base_conv & (
            sigma_threshold - max_norm > cfg.admm_gradient_tolerance * sigma_threshold
        )
        converged = base_conv & ~fake
        # fake convergence: double the J' scaling and restart the ADMM
        # counter, keeping u/lambda (reference 2d:1230-1243 only rescales J'
        # and resets the step counter)
        scaling = jnp.where(fake, st.scaling * 2.0, st.scaling)
        row = jnp.stack(
            [
                st.scaling,
                sigma_threshold * jnp.ones_like(st.scaling),
                u_diff_norm,
                lam_inc_norm,
                max_norm,
                sigma_threshold - max_norm,
            ]
        )
        stats = st.stats.at[jnp.minimum(st.admm_it, cfg.admm_steps - 1)].set(row)
        admm_it = jnp.where(fake, 0, st.admm_it + 1)
        # convergence is checked BEFORE the max-step failure (reference
        # 2d:1226 precedes 2d:1245)
        failed = x_failed | ((admm_it >= cfg.admm_steps) & ~converged)

        new = ADMMState(
            u=u,
            u_old=u,
            lam=lam,
            q_proj=q_proj,
            Lambda=Lambda,
            scaling=scaling,
            admm_it=admm_it,
            total_newton=st.total_newton + nit,
            total_lin_iters=st.total_lin_iters + nlin,
            solver_iters=st.solver_iters + nlin_each,
            converged=converged,
            failed=failed,
            u_diff_norm=u_diff_norm,
            lam_inc_norm=lam_inc_norm,
            max_grad_norm=max_norm,
            stats=stats,
        )
        # freeze lanes that were already finished (vmap semantics)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b), (new, xsols_new), (st, xsols)
        )

    # one st solve + m constraint solves per Newton iteration
    xsols0 = jnp.zeros((1 + m,) + state.u.shape, dtype)
    st, _ = jax.lax.while_loop(cond, body, (state, xsols0))
    return st


def admm_inner(
    cfg: ADMMConfig,
    struct: mg.MGStructure,
    mgdata: mg.MGData,
    coords,
    elems,
    free,
    Jp_base,
    sigma_threshold,
    scaling0,
    ref_volume,
    ref_barycenter,
    extra_hvp=None,
):
    """Compatibility wrapper: global-representation ADMM loop."""
    from .spaces import GlobalOps

    ops_ = GlobalOps(struct, mgdata, coords, elems, free)
    return admm_inner_ops(
        cfg, ops_, Jp_base, sigma_threshold, scaling0, ref_volume,
        ref_barycenter, extra_hvp=extra_hvp,
    )


# ---------------------------------------------------------------------------
# host-stepped driver (one ADMM iteration per device execution)
# ---------------------------------------------------------------------------

def admm_inner_stepped(
    cfg: ADMMConfig,
    ops_builder,
    builder_args: tuple,
    Jp_base,
    sigma_threshold: float,
    scaling0: float,
    ref_volume,
    ref_barycenter,
    kernel_cache: dict,
    verbose: bool = False,
    iter_cb=None,
    newton_hist_out: list | None = None,
    full_stats_out: list | None = None,
    debug_out: dict | None = None,
):
    """Host-stepped twin of admm_inner_ops: identical algorithm, but the
    ADMM while-loop runs on the host with ONE device execution per ADMM
    iteration (z-update + x-update Newton + dual ascent).

    newton_hist_out: optional list filled (in place) with the LAST ADMM
    iteration's per-Newton-iteration rows [norm_sum, |du|, |DLambda|, |Lu|,
    rhs_iters, constraint_iters...] - the reference re-initializes its
    vNS_* arrays at every ADMM iteration (2d:911-921) and writes them once
    per optimization step (2d:1256-1259), so the files hold exactly the
    last iteration's history.
    full_stats_out: optional list filled with EVERY ADMM stats row, across
    fake-convergence restarts (the fixed-size ADMMState.stats array only
    keeps the trailing admm_steps rows).
    debug_out: optional dict filled with the last Newton iteration's
    (Lu, rhs_large, du) fields under keys "Lu"/"rhs_large"/"du" - the
    -bDebugOutput VTU payloads (reference 2d_admm.lua:962-1076).

    iter_cb(k, u): optional host callback fired after every ADMM iteration
    with the running iteration count k (monotone across fake-convergence
    restarts) and the current deformation iterate u in the representation's
    layout — the hook behind -bOutputIntermediateUp (reference 2d:84: VTK
    of every ADMM iterate's u).

    Why: the monolithic jitted loop is a single device execution of
    admm_steps * ns_max_its * (2+m) multigrid solves - minutes of wall clock
    at 3D refs>=3, which the TPU tunnel does not survive reliably, and a
    giant program to compile.  The stepped driver bounds executions at one
    ADMM iteration (~seconds) and emits per-iteration stats (the reference
    prints each ADMM step too, 2d_admm.lua:1221-1223).

    ops_builder(*builder_args) -> representation adapter (optim.spaces);
    builder_args are traced pytree args of the jitted body so nothing is
    baked as constants.  kernel_cache: per-problem dict for kernel reuse.
    """
    key = ("admm_body", cfg, ops_builder)
    if key not in kernel_cache:

        def body(builder_args, Jp, u, u_old, lam, Lambda_in, xsols, sigma, scaling):
            ops_ = ops_builder(*builder_args)
            q_proj = ops_.z_update(u, lam, cfg.tau, sigma, cfg.norm_name)
            if cfg.relax_alpha != 1.0:
                al = jnp.asarray(cfg.relax_alpha, q_proj.dtype)
                q_hat = al * q_proj + (1.0 - al) * ops_.grad_tensor(u)
            else:
                q_hat = q_proj
            max_norm = ops_.max_grad_norm(u_old, cfg.norm_name)
            (u2, Lambda, nit, nlin, nlin_each, x_failed, xsols2, nhist,
             dbg) = newton_xupdate_ops(
                cfg, ops_, Jp, scaling, lam, q_hat, ref_volume,
                ref_barycenter, u, Lambda_in, sols0=xsols,
            )
            lam2, lam_inc = ops_.dual_update(u2, lam, q_hat, cfg.tau)
            u_diff = ops_.norm_p1(u2 - u_old)
            lam_inc_n = ops_.norm_pc(lam_inc)
            return (u2, lam2, q_proj, Lambda, xsols2, nit, nlin, nlin_each,
                    x_failed, max_norm, u_diff, lam_inc_n, nhist, dbg)

        kernel_cache[key] = jax.jit(body)
    body_fn = kernel_cache[key]

    ops_probe = ops_builder(*builder_args)
    dtype = Jp_base.dtype
    u = ops_probe.zeros_field(dtype)
    u_old = ops_probe.zeros_field(dtype)
    lam = ops_probe.zeros_tensor(dtype)
    q_proj = lam
    Lambda = _lambda_init(cfg, 1 + ops_probe.dim, dtype)
    xsols = jnp.zeros((2 + ops_probe.dim,) + u.shape, dtype)
    scaling = float(scaling0)
    sigma = float(sigma_threshold)
    stats_rows = []
    admm_it = 0
    total_newton = 0
    total_lin = 0
    import numpy as _np0

    total_lin_each = _np0.zeros(2 + ops_probe.dim, _np0.int64)
    converged = failed = False
    u_diff = lam_inc_n = float("inf")
    max_norm = 0.0

    last_nhist = None
    while not converged and not failed and admm_it < cfg.admm_steps:
        (u, lam, q_proj, Lambda, xsols, nit, nlin, nlin_each, x_failed,
         max_norm_j, u_diff_j, lam_inc_j, nhist, dbg_j) = body_fn(
            builder_args, Jp_base, u, u_old, lam, Lambda, xsols,
            jnp.asarray(sigma, dtype), jnp.asarray(scaling, dtype),
        )
        last_nhist = (nhist, int(nit))
        if debug_out is not None:
            debug_out["Lu"], debug_out["rhs_large"], debug_out["du"] = dbg_j
        u_old = u
        if iter_cb is not None:
            iter_cb(len(stats_rows), u)
        total_newton += int(nit)
        total_lin += int(nlin)
        total_lin_each += _np0.asarray(nlin_each)
        max_norm = float(max_norm_j)
        u_diff = float(u_diff_j)
        lam_inc_n = float(lam_inc_j)
        x_failed = bool(x_failed)
        # convergence logic (2d:1226-1250), on host scalars
        base_conv = (
            lam_inc_n < cfg.admm_tolerance
            and u_diff < cfg.admm_tolerance
            and sigma - max_norm > -cfg.admm_gradient_tolerance * sigma
        )
        fake = base_conv and (
            sigma - max_norm > cfg.admm_gradient_tolerance * sigma
        )
        converged = base_conv and not fake
        stats_rows.append(
            [scaling, sigma, u_diff, lam_inc_n, max_norm, sigma - max_norm]
        )
        if verbose:
            print(
                f"  admm {admm_it}: u_diff {u_diff:.3e} lam_inc {lam_inc_n:.3e} "
                f"max|grad| {max_norm:.3f} newton {int(nit)}"
                + (" FAKE->rescale" if fake else "")
            )
        if fake:
            scaling *= 2.0
            admm_it = 0
        else:
            admm_it += 1
        failed = x_failed or (admm_it >= cfg.admm_steps and not converged)

    if newton_hist_out is not None and last_nhist is not None:
        import numpy as _np

        nh, nit_last = last_nhist
        rows = _np.asarray(nh)[:nit_last]
        # nit counts ACTIVE iterations but a row is stored only when the
        # update was APPLIED (a final failed Krylov solve leaves an all-zero
        # trailing row): drop trailing zero rows so the file holds exactly
        # the applied iterations (reference semantics, 2d:1111-1120)
        while len(rows) and not rows[-1].any():
            rows = rows[:-1]
        newton_hist_out[:] = rows.tolist()
    if full_stats_out is not None:
        full_stats_out[:] = [list(r) for r in stats_rows]
    stats = jnp.zeros((cfg.admm_steps, 6), dtype)
    if stats_rows:
        n = min(len(stats_rows), cfg.admm_steps)
        stats = stats.at[:n].set(jnp.asarray(stats_rows[-n:], dtype))
    return ADMMState(
        u=u,
        u_old=u_old,
        lam=lam,
        q_proj=q_proj,
        Lambda=Lambda,
        scaling=jnp.asarray(scaling, dtype),
        admm_it=jnp.asarray(admm_it, jnp.int32),
        total_newton=jnp.asarray(total_newton, jnp.int32),
        total_lin_iters=jnp.asarray(total_lin, jnp.int32),
        solver_iters=jnp.asarray(total_lin_each, jnp.int32),
        converged=jnp.asarray(converged),
        failed=jnp.asarray(failed),
        u_diff_norm=jnp.asarray(u_diff, dtype),
        lam_inc_norm=jnp.asarray(lam_inc_n, dtype),
        max_grad_norm=jnp.asarray(max_norm, dtype),
        stats=stats,
    )
