"""Geometric multigrid on brick-patch lattices (the TPU fast path).

Same algorithm as solvers.mg (Chebyshev-smoothed V-cycle, dense MXU base
solve - replacing the reference's GS-smoothed GMG + SuperLU,
obstacle_optim_util.lua:16-32) but on the patch-stencil representation
(ops.patchstencil): all level operations are static-slice stencil ops, and
the only irregular work is the small boundary-consistency exchange per
operator application.  Iterate-for-iterate equivalent to the block-ELL MG:
the duplicated patch space with owner-weighted inner products is an exact
isometric image of the global DoF space.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.patches import PatchSet
from ..ops import patchstencil as st


@dataclasses.dataclass(frozen=True)
class PatchMGStructure:
    ps: PatchSet
    pre_smooth: int = 3
    post_smooth: int = 3
    cheb_lower: float = 0.25


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PatchMGData:
    """Device data per level (a pytree, jit-friendly)."""

    W: list  # per level: (C, C, O, *lat, P) baked stencils
    inv_diag: list  # per level: (C, *lat, P) consistent 1/diag (1 at fixed)
    free: list  # per level: (*lat, P) float masks
    lmax: list  # per level scalar
    base_inv: Any  # dense inverse of the level-0 global operator (C*V0 sq)

    def tree_flatten(self):
        return ((self.W, self.inv_diag, self.free, self.lmax, self.base_inv), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _operator(struct: PatchMGStructure, data: PatchMGData, level: int):
    ps = struct.ps
    lvl = ps.levels[level]
    W = data.W[level]
    free = data.free[level]

    def A(x):
        y = st.exchange_sum(lvl, st.apply_w(ps, W, x))
        return y * free[None]

    return A


def estimate_lmax_p(struct, ps, lvl, W, inv_diag, free, iters: int = 15):
    """Power iteration for lambda_max(D^-1 A) with owner-weighted norms."""
    shape = (ps.dim,) + lvl.lat_shape + (lvl.P,)
    n = int(np.prod(shape))
    x = (jnp.sin(jnp.arange(n, dtype=W.dtype)) + 1.0).reshape(shape)
    x = st.exchange_sum(lvl, x) * free[None]

    def apply(x):
        return st.exchange_sum(lvl, st.apply_w(ps, W, x)) * free[None]

    def body(i, x):
        y = inv_diag * apply(x)
        return y / jnp.maximum(jnp.sqrt(st.owner_dot(lvl, y, y)), 1e-30)

    x = jax.lax.fori_loop(
        0, iters, body, x / jnp.maximum(jnp.sqrt(st.owner_dot(lvl, x, x)), 1e-30)
    )
    y = inv_diag * apply(x)
    return st.owner_dot(lvl, x, y) / st.owner_dot(lvl, x, x) * 1.1


def assemble_patch_mg(
    ps: PatchSet,
    struct: PatchMGStructure,
    coords_global: jnp.ndarray,  # (V, d) current fine-mesh coordinates
    corner_mat_fn: Callable,  # corners (d, nl, ...) -> (C,C,nl,nl,...)
    base_dense_fn: Callable,  # coords0 (V0, d) -> dense inverse (C*V0, C*V0)
) -> PatchMGData:
    """Assemble all levels from current geometry (rap=true analogue:
    rediscretized coarse operators from the nested lattice coordinates)."""
    fine = ps.fine
    coords_p = st.to_patch(fine, coords_global.T)  # (d, *latf, P)
    W_l, invd_l, free_l, lmax_l = [], [], [], []
    for l, lvl in enumerate(ps.levels):
        stride = 2 ** (ps.k - l)
        sl = (slice(None),) + tuple(
            slice(0, None, stride) for _ in range(ps.dim)
        )
        cp = coords_p[sl]
        W = st.assemble_w(ps, l, cp, corner_mat_fn)
        W = st.bake_dirichlet_w(ps, l, W)
        free = jnp.asarray(lvl.free, W.dtype)
        diag = st.exchange_sum(lvl, st.stencil_diag(ps, l, W))
        diag = jnp.where(free[None] > 0, diag, 1.0)
        inv_diag = 1.0 / diag
        W_l.append(W)
        invd_l.append(inv_diag)
        free_l.append(free)
        lmax_l.append(estimate_lmax_p(struct, ps, lvl, W, inv_diag, free))
    V0 = int(ps.levels[0].gid.max()) + 1
    base_inv = base_dense_fn(coords_global[:V0])
    return PatchMGData(W_l, invd_l, free_l, lmax_l, base_inv)


def chebyshev_smooth_p(ps, lvl, W, inv_diag, free, lmax, x, b, degree, lower):
    """Chebyshev iteration (see solvers.mg.chebyshev_smooth) on patch arrays;
    x, b consistent."""
    lmin = lower * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)

    def apply(x):
        return st.exchange_sum(lvl, st.apply_w(ps, W, x)) * free[None]

    r = (b - apply(x)) * free[None]
    z = inv_diag * r
    d_vec = z / theta
    x = x + d_vec
    sigma_old = theta / delta if degree > 1 else 1.0

    def body(i, carry):
        x, d_vec, sigma_old = carry
        r = (b - apply(x)) * free[None]
        z = inv_diag * r
        sigma_new = 1.0 / (2.0 * theta / delta - sigma_old)
        d_vec = (2.0 * sigma_new / delta) * z + (sigma_new * sigma_old) * d_vec
        return (x + d_vec, d_vec, sigma_new)

    if degree > 1:
        x, _, _ = jax.lax.fori_loop(0, degree - 1, body, (x, d_vec, sigma_old))
    return x


def vcycle_p(struct: PatchMGStructure, data: PatchMGData, b, x0=None):
    """One V(pre,post)-cycle; b, x (C, *latf, P) consistent, free-masked."""
    ps = struct.ps
    L = ps.k

    def solve_level(l, b_l, x_l):
        lvl = ps.levels[l]
        if l == 0:
            # gathered dense base solve (SuperLU analogue): additive global
            # residual -> dense inverse -> consistent patch vector
            C = b_l.shape[0]
            V0 = data.base_inv.shape[0] // C
            # b_l is consistent here; convert to global by owner picking
            bg = st.from_patch(lvl, b_l, V0, mode="owner")  # (C, V0)
            xg = (data.base_inv @ bg.reshape(-1)).reshape(C, V0)
            return st.to_patch(lvl, xg)
        x_l = chebyshev_smooth_p(
            ps, lvl, data.W[l], data.inv_diag[l], data.free[l], data.lmax[l],
            x_l, b_l, struct.pre_smooth, struct.cheb_lower,
        )
        # restriction acts on the ADDITIVE residual (UG4 storage-type rule:
        # defects are additive, 2d_admm.lua:958): owner-weighted b minus the
        # raw per-patch partial sums - restricting a consistent vector would
        # double-count duplicated sites
        owner = jnp.asarray(lvl.owner, b_l.dtype)
        r_add = b_l * owner[None] - st.apply_w(ps, data.W[l], x_l)
        rc = st.restrict_p(ps, l - 1, r_add)
        rc = st.exchange_sum(ps.levels[l - 1], rc) * data.free[l - 1][None]
        ec = solve_level(l - 1, rc, jnp.zeros_like(rc))
        x_l = x_l + st.prolong_p(ps, l - 1, ec) * data.free[l][None]
        x_l = chebyshev_smooth_p(
            ps, lvl, data.W[l], data.inv_diag[l], data.free[l], data.lmax[l],
            x_l, b_l, struct.post_smooth, struct.cheb_lower,
        )
        return x_l

    if x0 is None:
        x0 = jnp.zeros_like(b)
    return solve_level(L, b, x0)


def make_preconditioner_p(struct: PatchMGStructure, data: PatchMGData):
    def M(r):
        return vcycle_p(struct, data, r)

    return M


def cg_p(
    struct: PatchMGStructure,
    data: PatchMGData,
    b,
    x0=None,
    max_iters: int = 60,
    abs_tol: float = 0.0,
    rel_tol: float = 1e-8,
):
    """MG-preconditioned CG on the fine patch level (ConvCheck semantics as
    solvers.krylov.cg, owner-weighted inner products)."""
    from . import krylov

    ps = struct.ps
    lvl = ps.fine
    A = _operator(struct, data, ps.k)
    M = make_preconditioner_p(struct, data)
    dot = lambda x, y: st.owner_dot(lvl, x, y)
    return krylov.cg(
        A, b, x0=x0, M=M, max_iters=max_iters, abs_tol=abs_tol, rel_tol=rel_tol,
        dot=dot,
    )
