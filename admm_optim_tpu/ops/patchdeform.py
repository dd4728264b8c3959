"""Deformation / ADMM element ops on the brick-patch lattice layout.

Patch-space counterparts of ops.deformation: every per-element quantity
becomes a per-(class, cell) quantity - elements of a brick lattice are
PARTITIONED across patches (unlike vertices, which are duplicated), so cell
reductions and elementwise tensor updates are exact with no exchange.
Per-element tensor fields (lambda, q, grad u) are stored as

    (d, d, T, *cells, P)      T = element classes (2 in 2D / 6 in 3D),
                              cells = (m,)^dim lattice cell boxes

All vertex-field access is static corner slicing (see ops.patchstencil);
AD through these functions yields scatter-free pad-transpose gradients, so
constraint gradients and Hessian-vector products (jacrev/jvp of
`constraints`) stay on the stencil fast path.

Parity: the same reference plugin classes as ops.deformation
(DeformationEquationRHS, SecondDerivative*, MassModel, Testing,
LambdaUpdate - 2d_admm.lua:423-669, 883-905).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.patches import PatchSet
from .deformation import project_frobenius, project_spectral, _svals_2x2
from .geometry import corner_geometry, p1_phys_grads, sdet


def _cell_slice(cv, m):
    return tuple(slice(int(o), int(o) + m) for o in cv)


def class_corners(ps: PatchSet, x_p: jnp.ndarray, m: int) -> jnp.ndarray:
    """x_p (C, *lat, P) -> corner values (C, nl, T, *cells, P)."""
    pre = (slice(None),)
    per_class = [
        jnp.stack([x_p[pre + _cell_slice(cv, m)] for cv in co], axis=1)
        for co in ps.class_offsets
    ]
    return jnp.stack(per_class, axis=2)


def cell_geometry(ps: PatchSet, coords_p: jnp.ndarray):
    """-> (g (nl, d, T, *cells, P) basis grads, vol (T, *cells, P))."""
    m = coords_p.shape[1] - 1
    xc = class_corners(ps, coords_p, m)  # (d, nl, T, *cells, P)
    _, _, Jinv, vol = corner_geometry(xc)
    g = p1_phys_grads(Jinv)  # (nl, d, T, *cells, P)
    return g, vol


def cell_grads(ps: PatchSet, coords_p, u_p):
    """Per-cell gradient of a P1 field u_p (C, *lat, P):
    (G (C, d, T, *cells, P), vol (T, *cells, P))."""
    m = coords_p.shape[1] - 1
    g, vol = cell_geometry(ps, coords_p)
    uc = class_corners(ps, u_p, m)  # (C, nl, T, *cells, P)
    # unrolled tiny contraction (C*d*nl <= 36 terms): the einsum form
    # lowers to per-cell MXU matmuls whose operand layouts put the (4,128)
    # tile on the size-3/4 axes - measured 25-57x padding expansion on the
    # full-lattice temporaries (OOM at 3D refs>=3)
    nl = g.shape[0]
    C = uc.shape[0]
    d = g.shape[1]
    G = jnp.stack(
        [
            jnp.stack(
                [
                    sum(g[i, dd] * uc[c, i] for i in range(nl))
                    for dd in range(d)
                ]
            )
            for c in range(C)
        ]
    )
    return G, vol


def tensor_rhs_p(ps: PatchSet, coords_p, M, vol=None):
    """Additive r (C, *lat, P): r = int M : grad w dx for per-cell tensor
    M (d, d, T, *cells, P).  Scatter-free (padded adds).  vol: optional
    per-cell weights overriding the geometric volumes (the analytic
    constraint derivatives pass pvalid-masked volumes)."""
    dim = ps.dim
    m = coords_p.shape[1] - 1
    g, vol_geo = cell_geometry(ps, coords_p)
    if vol is None:
        vol = vol_geo
    # (C, nl, T, *cells, P); unrolled like cell_grads (layout pathology)
    nl_ = dim + 1
    contrib = jnp.stack(
        [
            jnp.stack(
                [
                    vol * sum(M[c, dd] * g[i, dd] for dd in range(dim))
                    for i in range(nl_)
                ],
            )
            for c in range(M.shape[0])
        ]
    )
    r = None
    for t, co in enumerate(ps.class_offsets):
        for a in range(dim + 1):
            pad = [(0, 0)] + [(int(o), 1 - int(o)) for o in co[a]] + [(0, 0)]
            term = jnp.pad(contrib[:, a, t], pad)
            r = term if r is None else r + term
    return r


def _vmask(vol, pvalid):
    """Mask cell volumes by patch validity (padded dummy patches carry
    copies of patch 0's geometry and must not contribute to reductions;
    core.patches.pad_patchset).  pvalid (P_local,) broadcasts on the
    trailing patch axis."""
    return vol if pvalid is None else vol * pvalid


def volume_defect_p(ps: PatchSet, coords_p, u_p, ref_volume, pvalid=None):
    """g_vol(u) = int det(I + grad u) dx - V_ref (exact; cells partitioned)."""
    G, vol = cell_grads(ps, coords_p, u_p)
    vol = _vmask(vol, pvalid)
    d = ps.dim
    eye = jnp.eye(d, dtype=coords_p.dtype).reshape((d, d) + (1,) * (G.ndim - 2))
    det = sdet(eye + G)
    return jnp.sum(vol * det) - ref_volume


def barycenter_p(ps: PatchSet, coords_p, u_p, pvalid=None):
    """b_i(u) = int (x_i + u_i) det(I + grad u) dx (unnormalized, (d,))."""
    m = coords_p.shape[1] - 1
    G, vol = cell_grads(ps, coords_p, u_p)
    vol = _vmask(vol, pvalid)
    d = ps.dim
    eye = jnp.eye(d, dtype=coords_p.dtype).reshape((d, d) + (1,) * (G.ndim - 2))
    det = sdet(eye + G)
    xc = class_corners(ps, coords_p, m) + class_corners(ps, u_p, m)
    centroid = xc.mean(axis=1)  # (d, T, *cells, P)
    return jnp.einsum("...,c...->c", vol * det, centroid)


def constraints_p(ps: PatchSet, coords_p, u_p, ref_volume, ref_barycenter,
                  pvalid=None):
    """g(u) in R^m, m = 1 + d (volume + barycenter defects).  Under patch
    sharding this returns the LOCAL partial sums (psum at the caller)."""
    return jnp.concatenate(
        [
            volume_defect_p(ps, coords_p, u_p, ref_volume, pvalid)[None],
            barycenter_p(ps, coords_p, u_p, pvalid) - ref_barycenter,
        ]
    )


def constraint_grads_p(ps, coords_p, u_p, ref_volume, ref_barycenter,
                       pvalid=None):
    """ADDITIVE B (m, C, *lat, P) = dg/du (exchange+mask at the caller).
    Correct under sharding as-is: d(local partial sum)/d(local u) is exactly
    this shard's additive contribution."""
    return jax.jacrev(
        lambda uu: constraints_p(
            ps, coords_p, uu, ref_volume, ref_barycenter, pvalid
        )
    )(u_p)


def constraint_hvp_p(ps, coords_p, u_p, Lmbda, ref_volume, ref_barycenter, x_p,
                     pvalid=None):
    """ADDITIVE (sum_i Lambda_i d2g_i/du2) @ x.  AD form, kept as the
    reference implementation for the analytic version's tests."""

    def lag(uu):
        g = constraints_p(ps, coords_p, uu, ref_volume, ref_barycenter, pvalid)
        return jnp.vdot(Lmbda, g)

    return jax.jvp(jax.grad(lag), (u_p,), (x_p,))[1]


# ---------------------------------------------------------------------------
# analytic constraint derivatives (cofactor calculus)
#
# The jacrev/jvp forms above are exact but their AD-transposed temporaries
# at 3D refs>=3 get XLA layouts with up to 128x tile padding (a single
# 33.8 GB padded temp at refs=4 - docs/ROADMAP.md round-2 notes).  The
# functionals are low-degree polynomials in u, so the derivatives have
# closed cofactor forms that assemble through the SAME controlled-layout
# pad-add scatter as tensor_rhs_p:
#   g_vol(u)  = sum vol det(A),  A = I + grad u
#   g_bar_j(u)= sum vol det(A) cent_j(u),  cent = corner mean of x + u
#   d det(A)[E]      = cof(A) : E
#   d2 det(A)[E1,E2] = Dcof(A)[E2] : E1   (Dcof bilinear, symmetric)
# ---------------------------------------------------------------------------


def _cof(A):
    """Cofactor matrix dd det/ddA of (d, d, ...) stacks (matches sdet)."""
    d = A.shape[0]
    if d == 2:
        return jnp.stack(
            [
                jnp.stack([A[1, 1], -A[1, 0]]),
                jnp.stack([-A[0, 1], A[0, 0]]),
            ]
        )
    r = lambda a, b, c, e: A[a[0], a[1]] * A[b[0], b[1]] - A[c[0], c[1]] * A[e[0], e[1]]
    return jnp.stack(
        [
            jnp.stack(
                [
                    r((1, 1), (2, 2), (1, 2), (2, 1)),
                    -r((1, 0), (2, 2), (1, 2), (2, 0)),
                    r((1, 0), (2, 1), (1, 1), (2, 0)),
                ]
            ),
            jnp.stack(
                [
                    -r((0, 1), (2, 2), (0, 2), (2, 1)),
                    r((0, 0), (2, 2), (0, 2), (2, 0)),
                    -r((0, 0), (2, 1), (0, 1), (2, 0)),
                ]
            ),
            jnp.stack(
                [
                    r((0, 1), (1, 2), (0, 2), (1, 1)),
                    -r((0, 0), (1, 2), (0, 2), (1, 0)),
                    r((0, 0), (1, 1), (0, 1), (1, 0)),
                ]
            ),
        ]
    )


def _dcof(A, E):
    """Directional derivative Dcof(A)[E] (d/dt cof(A + tE) at t=0)."""
    d = A.shape[0]
    if d == 2:
        return _cof(E)  # cof is linear in 2D

    def p(a, b):
        return A[a[0], a[1]] * E[b[0], b[1]] + E[a[0], a[1]] * A[b[0], b[1]]

    r = lambda a, b, c, e: p(a, b) - p(c, e)
    return jnp.stack(
        [
            jnp.stack(
                [
                    r((1, 1), (2, 2), (1, 2), (2, 1)),
                    -r((1, 0), (2, 2), (1, 2), (2, 0)),
                    r((1, 0), (2, 1), (1, 1), (2, 0)),
                ]
            ),
            jnp.stack(
                [
                    -r((0, 1), (2, 2), (0, 2), (2, 1)),
                    r((0, 0), (2, 2), (0, 2), (2, 0)),
                    -r((0, 0), (2, 1), (0, 1), (2, 0)),
                ]
            ),
            jnp.stack(
                [
                    r((0, 1), (1, 2), (0, 2), (1, 1)),
                    -r((0, 0), (1, 2), (0, 2), (1, 0)),
                    r((0, 0), (1, 1), (0, 1), (1, 0)),
                ]
            ),
        ]
    )


def scalar_rhs_p(ps: PatchSet, S):
    """Additive r (C, *lat, P) from per-cell scalars S (C, T, *cells, P):
    each cell adds S[c]/nl at every corner (the mass-like centroid term of
    the barycenter derivatives)."""
    dim = ps.dim
    nl = dim + 1
    contrib = S / nl
    r = None
    for t, co in enumerate(ps.class_offsets):
        for a in range(nl):
            pad = [(0, 0)] + [(int(o), 1 - int(o)) for o in co[a]] + [(0, 0)]
            term = jnp.pad(contrib[:, t], pad)
            r = term if r is None else r + term
    return r


def _cell_state(ps, coords_p, u_p, pvalid):
    m = coords_p.shape[1] - 1
    G, vol = cell_grads(ps, coords_p, u_p)
    vol = _vmask(vol, pvalid)
    d = ps.dim
    eye = jnp.eye(d, dtype=coords_p.dtype).reshape((d, d) + (1,) * (G.ndim - 2))
    A = eye + G
    xc = class_corners(ps, coords_p, m) + class_corners(ps, u_p, m)
    cent = xc.mean(axis=1)  # (d, T, *cells, P)
    return A, vol, cent, m


def constraint_grads_analytic_p(ps, coords_p, u_p, ref_volume, ref_barycenter,
                                pvalid=None):
    """ADDITIVE B (m, C, *lat, P) = dg/du, closed form:
    B_vol       = sum_cells vol cof(A)[c,b] g[i,b]
    B_bar_j     = sum_cells vol (cof(A)[c,b] g[i,b] cent_j + det(A) e_j/nl).
    Validated against the jacrev form (tests/test_patch_admm.py)."""
    d = ps.dim
    A, vol, cent, m = _cell_state(ps, coords_p, u_p, pvalid)
    cof = _cof(A)
    det = sdet(A)
    rows = [tensor_rhs_p(ps, coords_p, cof, vol=vol)]
    for j in range(d):
        r = tensor_rhs_p(ps, coords_p, cof * cent[j], vol=vol)
        S = jnp.zeros((d,) + det.shape, det.dtype).at[j].set(vol * det)
        rows.append(r + scalar_rhs_p(ps, S))
    return jnp.stack(rows)


def hvp_state_p(ps, coords_p, u_p, Lmbda, pvalid=None):
    """(u, Lambda)-dependent cell state of the constraint HVP, precomputed
    ONCE per Newton iterate: the HVP is applied at every Krylov matvec
    (2x per BiCGStab iteration), and cell_grads(u) + cof(A) + the class
    centroids are matvec-invariant - measured 35 ms/apply at 3D refs=4
    with them recomputed inline, vs A's 10 ms."""
    A, vol, cent, m = _cell_state(ps, coords_p, u_p, pvalid)
    return (A, _cof(A), vol, cent, Lmbda, m)


def constraint_hvp_apply_p(ps, coords_p, state, x_p):
    """ADDITIVE (sum_k Lambda_k d2g_k/du2) @ x at the precomputed state:
    h = sum vol [ (L0 Dcof(A)[Ex]
                   + sum_j L_{1+j} (Dcof(A)[Ex] cent_j + cof(A) cx_j))
                     : grad w
                 + sum_j L_{1+j} (cof(A):Ex) e_j . w/nl ]"""
    d = ps.dim
    A, cof, vol, cent, Lmbda, m = state
    Ex, _ = cell_grads(ps, coords_p, x_p)
    cx = class_corners(ps, x_p, m).mean(axis=1)  # (d, T, *cells, P)
    dc = _dcof(A, Ex)
    M = Lmbda[0] * dc
    cofEx = sum(cof[a, b] * Ex[a, b] for a in range(d) for b in range(d))
    S = jnp.zeros((d,) + cofEx.shape, cofEx.dtype)
    for j in range(d):
        M = M + Lmbda[1 + j] * (dc * cent[j] + cof * cx[j])
        S = S.at[j].set(Lmbda[1 + j] * vol * cofEx)
    return tensor_rhs_p(ps, coords_p, M, vol=vol) + scalar_rhs_p(ps, S)


def constraint_hvp_analytic_p(ps, coords_p, u_p, Lmbda, ref_volume,
                              ref_barycenter, x_p, pvalid=None):
    """One-shot form (state recomputed inline); the solver hot path uses
    hvp_state_p + constraint_hvp_apply_p."""
    state = hvp_state_p(ps, coords_p, u_p, Lmbda, pvalid=pvalid)
    return constraint_hvp_apply_p(ps, coords_p, state, x_p)


def hvp_corner_block_fn(Lmbda):
    """Block-protocol corner matrices (ops.patchstencil.assemble_w) of the
    constraint Hessian sum_k Lambda_k d2g_k/du2 at a frozen Newton iterate.

    The per-cell energy behind the geometric constraints is
      E_cell(u) = vol0 * det(A(u)) * (L0 + sum_j L_{1+j} cent_j(u)),
    A = I + grad u, cent = mean of (X + u) corners - its corner-pair
    Hessian blocks are, with C = cof(A), S = L0 + sum_j L_{1+j} cent_j,
    g_a the physical P1 basis gradients and nl = d+1:
      blk(a,b)[c,f] = vol0 [ S * (dC/dA)[e_f (x) g_b]^{ck} g_a^k
                             + (C g_a)^c L_{1+f}/nl + L_{1+c}/nl (C g_b)^f ]
    (the same three terms constraint_hvp_apply_p applies matvec-side:
    S*Dcof, cof*cx, and the scalar_rhs cof:Ex row).  Assembling these into
    stencil slots ONCE per Newton iterate turns every Krylov H-matvec from
    A-apply + 35 ms of HVP cell work into a single fused stencil apply
    (the refs=4 ADMM iteration cost is matvec-side, docs/ROADMAP.md r3).

    Corners arrive as stacked channels [coords | u] (2d, nl, *cells, P),
    the convdiff-assembly convention; Lmbda may be a tracer (the caller
    assembles inside the jitted ADMM loop).  Blocks are Hessian-symmetric
    (blk(a,b) = blk(b,a)^T), so sym=True half-stencil storage is valid."""
    from .geometry import corner_geometry

    def fn(xc):
        d = xc.shape[0] // 2
        x, u = xc[:d], xc[d:]
        nl = d + 1
        _, _, Jinv, vol = corner_geometry(x)
        g = p1_phys_grads(Jinv)  # (nl, d, *cells, P)
        # A = I + grad u from corner values (unrolled tiny contractions -
        # einsum layouts tile-pad the size-d axes, see cell_grads)
        eye = jnp.eye(d, dtype=xc.dtype).reshape((d, d) + (1,) * (g.ndim - 2))
        G = jnp.stack(
            [
                jnp.stack(
                    [sum(g[i, e] * u[c, i] for i in range(nl)) for e in range(d)]
                )
                for c in range(d)
            ]
        )
        A = eye + G
        C = _cof(A)
        cent = (x + u).mean(axis=1)  # (d, *cells, P)
        S = Lmbda[0] + sum(Lmbda[1 + j] * cent[j] for j in range(d))

        def blk(a, b):
            # Cga^c = (C g_a)^c ; Cgb^f = (C g_b)^f
            Cga = [sum(C[c, k] * g[a, k] for k in range(d)) for c in range(d)]
            Cgb = [sum(C[f, m] * g[b, m] for m in range(d)) for f in range(d)]
            cols = []
            for f in range(d):
                # E = e_f (x) g_b  ->  dC = Dcof(A)[E]
                E = jnp.zeros_like(A).at[f].set(g[b])
                dC = _dcof(A, E)
                col = [
                    vol
                    * (
                        S * sum(dC[c, k] * g[a, k] for k in range(d))
                        + Cga[c] * (Lmbda[1 + f] / nl)
                        + (Lmbda[1 + c] / nl) * Cgb[f]
                    )
                    for c in range(d)
                ]
                cols.append(jnp.stack(col))
            return jnp.stack(cols, axis=1)  # (c, f, *cells, P)

        return blk

    fn.block_protocol = True
    return fn


def z_update_p(ps, coords_p, u_p, lam, tau, sigma, norm_name="frobenius"):
    """q* = Proj_sigma(grad u + lambda/tau), per cell (d, d, T, *cells, P)."""
    G, _ = cell_grads(ps, coords_p, u_p)
    Q = G + lam / tau
    if norm_name == "spectral":
        d = ps.dim
        shp = Q.shape
        Qf = Q.reshape(d, d, -1)
        out = project_spectral(Qf, sigma)
        return out.reshape(shp)
    return project_frobenius(Q, sigma)


def dual_update_p(ps, coords_p, u_p, lam, q_proj, tau):
    """lambda += tau*(grad u - q*); returns (new lam, increment)."""
    G, _ = cell_grads(ps, coords_p, u_p)
    inc = tau * (G - q_proj)
    return lam + inc, inc


def max_frobenius_norm_p(ps, coords_p, u_p, pvalid=None):
    G, _ = cell_grads(ps, coords_p, u_p)
    n2 = jnp.sum(G * G, axis=(0, 1))
    if pvalid is not None:
        n2 = n2 * pvalid
    return jnp.max(jnp.sqrt(n2))


def max_spectral_norm_p(ps, coords_p, u_p, pvalid=None):
    G, _ = cell_grads(ps, coords_p, u_p)
    if pvalid is not None:
        G = G * pvalid
    if ps.dim == 2:
        _, _, _, _, e1, e2 = _svals_2x2(G)
        return jnp.max(e1 + e2)
    d = ps.dim
    Gf = jnp.moveaxis(G.reshape(d, d, -1), -1, 0)
    s = jnp.linalg.svd(Gf, compute_uv=False)
    return jnp.max(s[:, 0])


def l2_norm_p1_p(ps, coords_p, f_p, pvalid=None):
    """sqrt(int |f|^2) for a consistent P1 patch field f (C, *lat, P)."""
    m = coords_p.shape[1] - 1
    _, vol = cell_geometry(ps, coords_p)
    vol = _vmask(vol, pvalid)
    fc = class_corners(ps, f_p, m)  # (C, nl, T, *cells, P)
    nl = ps.dim + 1
    mfac = ((jnp.ones((nl, nl)) + jnp.eye(nl)) / ((ps.dim + 1) * (ps.dim + 2))).astype(
        f_p.dtype
    )
    val = jnp.einsum("...,ij,ci...,cj...->", vol, mfac, fc, fc)
    return jnp.sqrt(jnp.maximum(val, 0.0))


def l2_norm_pc_p(ps, coords_p, T, pvalid=None):
    """sqrt(int |T|^2) for a per-cell tensor field (d, d, T, *cells, P)."""
    _, vol = cell_geometry(ps, coords_p)
    vol = _vmask(vol, pvalid)
    return jnp.sqrt(jnp.maximum(jnp.einsum("...,cd...,cd...->", vol, T, T), 0.0))
