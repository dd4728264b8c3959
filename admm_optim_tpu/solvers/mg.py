"""Geometric multigrid on refinement hierarchies.

TPU-native replacement for UG4's ``GeometricMultiGrid`` preconditioner
(reference obstacle_optim_util.lua:16-32): V-cycle over the uniform
refinement hierarchy with

 * **Chebyshev-polynomial smoothing** instead of the reference's sequential
   Gauss-Seidel sweeps (obstacle_optim_util.lua:17).  GS does not vectorize
   on SIMD hardware; Chebyshev over the Jacobi-preconditioned operator is
   the standard data-parallel substitute with comparable smoothing factors
   and is all batched SpMV (documented substitution per SURVEY.md section 7).
 * **Rediscretized coarse operators** (the hierarchy's coarse meshes are
   available and assembly is a fused batched op) instead of Galerkin RAP
   (rap=true, obstacle_optim_util.lua:28) - equivalent for these nested P1
   spaces up to quadrature, cheaper on TPU.
 * **Dense coarse solve** on level 0 replacing SuperLU
   (obstacle_optim_util.lua:22): the operator inverse is formed once per
   assembly and applied as a single MXU matmul per V-cycle - TPU triangular
   solves are sequential and dominate both compile and run time, a dense
   matmul is ~100x cheaper here.

All level vectors are FLAT component-major ``(C*N_l,)`` (see ops.sparsity
layout notes).  Transfers exploit the hierarchy invariant (core.mesh):
every fine vertex is the midpoint of a coarse edge or a coarse vertex with
parents (v, v), so P1 prolongation is uniformly ``0.5*(x[p0] + x[p1])`` -
one gather + add along the minor axis.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops import sparsity
from ..ops.sparsity import Pattern


def prolong(parents: jnp.ndarray, xc: jnp.ndarray, C: int) -> jnp.ndarray:
    """flat (C*Vc,) -> (C*Vf,) with parents (Vf, 2) into the coarse level."""
    Xc = xc.reshape(C, -1)
    Xf = 0.5 * (Xc[:, parents[:, 0]] + Xc[:, parents[:, 1]])
    return Xf.reshape(-1)


def restrict(parents: jnp.ndarray, xf: jnp.ndarray, n_coarse: int, C: int) -> jnp.ndarray:
    """Transpose of prolong: flat (C*Vf,) -> (C*Vc,)."""
    Xf = 0.5 * xf.reshape(C, -1)

    def seg(v):
        return jax.ops.segment_sum(v, parents[:, 0], num_segments=n_coarse) + (
            jax.ops.segment_sum(v, parents[:, 1], num_segments=n_coarse)
        )

    return jax.vmap(seg)(Xf).reshape(-1)


@dataclasses.dataclass(frozen=True)
class MGStructure:
    """Static part: one Pattern per level; levels[0] is the COARSEST."""

    patterns: tuple[Pattern, ...]
    n_levels: int
    pre_smooth: int = 3
    post_smooth: int = 3
    cheb_lower: float = 0.25  # smoothing interval [cheb_lower*lmax, lmax]
    smoother: str = "chebyshev"  # "chebyshev" (SPD) | "jacobi" (nonsymmetric)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MGData:
    """Dynamic part (device arrays); a pytree so it can be a jit argument."""

    vals: list  # per level: (C, C, K, N)
    diag: list  # per level: flat (C*N,)
    free: list  # per level: flat (C*N,) float mask (0 at Dirichlet dofs)
    parents: list  # per level l>=1: (V_l, 2) int32 into level l-1
    lmax: list  # per level: scalar Chebyshev upper bound
    base_inv: Any  # dense inverse of the level-0 operator
    # optional per-level values of A^T (sparsity.transpose_values): when
    # present, every spmv in the cycle carries a custom linear-transpose
    # rule so jax.vjp of the V-cycle (the adjoint solve's transposed
    # preconditioner, ns_solver.transpose_M) never emits a TPU scatter
    vals_t: Any = None

    def tree_flatten(self):
        return (
            (self.vals, self.diag, self.free, self.parents, self.lmax,
             self.base_inv, self.vals_t),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _spmv(pat, vals, vals_t, x):
    if vals_t is None:
        return sparsity.spmv_flat(pat, vals, x)
    return sparsity.spmv_flat_pair(pat, vals, vals_t, x)


def estimate_lmax(pat: Pattern, vals, diag, iters: int = 15) -> jnp.ndarray:
    """Power iteration for lambda_max(D^-1 A); deterministic start vector."""
    n = pat.n_flat
    x = jnp.sin(jnp.arange(n, dtype=vals.dtype)) + 1.0
    inv_d = 1.0 / jnp.maximum(diag, 1e-30)

    def body(i, x):
        y = inv_d * sparsity.spmv_flat(pat, vals, x)
        return y / jnp.maximum(jnp.sqrt(jnp.vdot(y, y)), 1e-30)

    x = jax.lax.fori_loop(0, iters, body, x / jnp.sqrt(jnp.vdot(x, x)))
    y = inv_d * sparsity.spmv_flat(pat, vals, x)
    return jnp.vdot(x, y) / jnp.vdot(x, x) * 1.1  # 10% safety margin


def chebyshev_smooth(pat: Pattern, vals, diag, lmax, x, b, degree: int, lower: float,
                     x_is_zero: bool = False, vals_t=None):
    """Chebyshev(degree) iteration for A x = b preconditioned by diag,
    targeting the interval [lower*lmax, lmax].  x_is_zero (static): skip the
    first SpMV exactly (A.0 = 0), as in patch_mg.chebyshev_smooth_p."""
    lmin = lower * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    inv_d = 1.0 / jnp.maximum(diag, 1e-30)

    r = b if x_is_zero else b - _spmv(pat, vals, vals_t, x)
    z = inv_d * r
    d_vec = z / theta
    x = x + d_vec
    # rho_0 = delta/theta seeds the Chebyshev rho-recurrence (Saad Alg.
    # 12.1); see solvers.patch_mg.chebyshev_smooth_p for the measured
    # impact of the former theta/delta seed (realized polynomial was far
    # from Chebyshev-optimal; degree 2 didn't damp at all).
    sigma_old = delta / theta if degree > 1 else 1.0

    def body(i, carry):
        x, d_vec, sigma_old = carry
        r = b - _spmv(pat, vals, vals_t, x)
        z = inv_d * r
        sigma_new = 1.0 / (2.0 * theta / delta - sigma_old)
        d_vec = (2.0 * sigma_new / delta) * z + (sigma_new * sigma_old) * d_vec
        x = x + d_vec
        return (x, d_vec, sigma_new)

    if degree > 1:
        x, _, _ = jax.lax.fori_loop(0, degree - 1, body, (x, d_vec, sigma_old))
    return x


def jacobi_smooth(pat: Pattern, vals, diag, lmax, x, b, degree: int, omega: float = 0.7,
                  x_is_zero: bool = False, vals_t=None):
    """Damped Jacobi, safe for the nonsymmetric convection-diffusion
    operators (Chebyshev assumes a real spectrum).  The damping is scaled by
    the power-iteration bound on D^-1 A."""
    inv_d = omega / (jnp.maximum(diag, 1e-30) * jnp.maximum(lmax, 1e-30))

    def body(i, x):
        r = b - _spmv(pat, vals, vals_t, x)
        return x + inv_d * r

    if x_is_zero and degree >= 1:
        x = x + inv_d * b
        return jax.lax.fori_loop(0, degree - 1, body, x)
    return jax.lax.fori_loop(0, degree, body, x)


def build_mg_data(
    struct: MGStructure,
    elem_mat_fn: Callable[[int], jnp.ndarray],
    fixed_masks: list,  # per level (C, N) bool
    parents: list,
) -> MGData:
    """Assemble all levels.  elem_mat_fn(level) -> (C, C, nl, nl, E)."""
    vals_l, diag_l, free_l, lmax_l = [], [], [], []
    for l, pat in enumerate(struct.patterns):
        em = elem_mat_fn(l)
        vals = sparsity.assemble_values(pat, em)
        vals = sparsity.bake_dirichlet(pat, vals, fixed_masks[l])
        d = sparsity.diag_cn(pat, vals).reshape(-1)
        vals_l.append(vals)
        diag_l.append(d)
        free_l.append(1.0 - fixed_masks[l].astype(vals.dtype).reshape(-1))
        lmax_l.append(estimate_lmax(pat, vals, d))
    dense0 = sparsity.to_dense(struct.patterns[0], vals_l[0])
    base_inv = jnp.linalg.inv(dense0)
    return MGData(vals_l, diag_l, free_l, [jnp.asarray(p) for p in parents], lmax_l, base_inv)


def vcycle(struct: MGStructure, data: MGData, b: jnp.ndarray, x0=None) -> jnp.ndarray:
    """One V(pre,post)-cycle on the finest level; flat vectors throughout."""
    L = struct.n_levels - 1
    C = struct.patterns[0].block

    if struct.smoother == "jacobi":
        smooth = lambda pat, v, d, lm, x, b, deg, xz=False, vt=None: jacobi_smooth(
            pat, v, d, lm, x, b, deg, x_is_zero=xz, vals_t=vt)
    else:
        smooth = lambda pat, v, d, lm, x, b, deg, xz=False, vt=None: chebyshev_smooth(
            pat, v, d, lm, x, b, deg, struct.cheb_lower, x_is_zero=xz, vals_t=vt
        )

    def solve_level(l, b_l, x_l, x_zero=False):
        pat = struct.patterns[l]
        vt = data.vals_t[l] if data.vals_t is not None else None
        if l == 0:
            return data.base_inv @ b_l
        x_l = smooth(
            pat, data.vals[l], data.diag[l], data.lmax[l], x_l, b_l,
            struct.pre_smooth, x_zero, vt
        )
        r = (b_l - _spmv(pat, data.vals[l], vt, x_l)) * data.free[l]
        rc = restrict(data.parents[l - 1], r, struct.patterns[l - 1].n_rows, C)
        rc = rc * data.free[l - 1]
        ec = solve_level(l - 1, rc, jnp.zeros_like(rc), x_zero=True)
        x_l = x_l + prolong(data.parents[l - 1], ec, C) * data.free[l]
        x_l = smooth(
            pat, data.vals[l], data.diag[l], data.lmax[l], x_l, b_l,
            struct.post_smooth, False, vt
        )
        return x_l

    x_zero = x0 is None
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return solve_level(L, b, x0, x_zero=x_zero)


def make_preconditioner(struct: MGStructure, data: MGData) -> Callable:
    """M(r) ~= A^-1 r : one V-cycle from zero initial guess."""

    def M(r):
        return vcycle(struct, data, r)

    return M
