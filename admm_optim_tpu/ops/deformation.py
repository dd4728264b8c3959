"""Deformation (x-update) operators, geometric constraint functionals and
ADMM proximal kernels.

TPU-native equivalents of the reference's plugin element discretizations:

 * ``DeformationEquation`` / ``DeformationEquationRHS`` (2d_admm.lua:388-456):
   the extension bilinear form a(u,w) + ADMM augmented term, and the linear
   RHS carrying the lambda / projected-q imports.
 * ``SecondDerivativeVolume`` / ``SecondDerivativeBarycenter``
   (2d_admm.lua:564-598): here the constraint functionals g(u) are closed-form
   per-element expressions (P1 deformation => grad(u) constant per element, so
   volume/barycenter integrals are EXACT) and their derivatives B_i = dg_i/du
   and Hessian actions come from JAX AD instead of hand-coded element loops.
 * ``MassModel`` + ``Testing``/``ProjectWithSpectralNorm`` (2d_admm.lua:630,
   897-902): the z-update.  The piecewise-constant mass solve is exact
   elementwise arithmetic (the reference's CG+Jacobi on a diagonal system,
   2d_admm.lua:680-682, is redundant on this structure), followed by the
   Frobenius- or spectral-norm ball projection.
 * ``LambdaUpdate`` (2d_admm.lua:653-669): dual ascent increment
   tau * (grad u - q_projected), exact per element.

Math spec (docs/MATH.md): the x-update minimizes
    F(u) = 1/2 a(u,u) + <J'_s, u> + tau/2 * int ||grad u - q* + lambda/tau||_F^2
subject to g(u) = 0 (volume + barycenter of the deformed domain), with
    a(u,w) = (1/step_length) * int [ eps(u):eps(w) + u.w ] dx.

**Layouts** (see ops.geometry): vertex fields ``u (C, V)``; per-element
tensors (lambda, q, grad u) ``(d, d, E)``; element matrices
``(C, C, nl, nl, E)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import elem_geometry, gather_elem, p1_phys_grads, sdet


# ---------------------------------------------------------------------------
# element matrices for the constant SPD part  a(u,w) + tau * (grad u, grad w)
# ---------------------------------------------------------------------------

def deformation_corner_mats(x, c_eps, c_grad, c_mass):
    """Like deformation_elem_mats but from explicit corner positions
    x (d, nl, ...) - any trailing batch layout (used by the patch-stencil
    assembly, ops.patchstencil, where corners come from lattice slices)."""
    from .geometry import corner_geometry

    d = x.shape[0]
    nl = d + 1
    _, _, Jinv, vol = corner_geometry(x)
    g = p1_phys_grads(Jinv)  # (nl, d, ...)
    K = jnp.einsum("ia...,ja...->ij...", g, g) * vol
    eyeC = jnp.eye(d, dtype=x.dtype)
    cross = jnp.einsum("id...,jc...,...->cdij...", g, g, vol)
    A = jnp.einsum("cd,ij...->cdij...", (c_grad + 0.5 * c_eps) * eyeC, K)
    A = A + 0.5 * c_eps * cross
    mfac = (jnp.ones((nl, nl)) + jnp.eye(nl)) / ((d + 1) * (d + 2))
    A = A + c_mass * jnp.einsum("cd,ij,...->cdij...", eyeC, mfac.astype(x.dtype), vol)
    return A


def deformation_corner_block_fn(c_eps, c_grad, c_mass):
    """Block-protocol variant of deformation_corner_mats for the patch
    assembly (ops.patchstencil.assemble_w): returns fn(corners) -> blk with
    blk(a, b) = A[:, :, a, b] (C, C, *cells, P) computed on demand from the
    shared basis gradients.

    Identical arithmetic to deformation_corner_mats, but never materializes
    the (C, C, nl, nl, *cells, P) tensor or its (nl*nl*C*C)-unit einsum
    temporaries: each local-dof block is pure elementwise work XLA fuses
    into the stencil-slot accumulation.  At 3D refs=5 (m=32, P=224) the
    dense-tensor path needs ~29 GB of assembly temporaries even chunked;
    this path assembles unchunked in O(nl*d) units (~0.6 GB)."""
    from .geometry import corner_geometry

    def fn(x):
        d = x.shape[0]
        nl = d + 1
        _, _, Jinv, vol = corner_geometry(x)
        g = p1_phys_grads(Jinv)  # (nl, d, ...)
        mfac = (np.ones((nl, nl)) + np.eye(nl)) / ((d + 1) * (d + 2))

        def blk(a, b):
            K_ab = sum(g[a, r] * g[b, r] for r in range(d)) * vol
            diag = (c_grad + 0.5 * c_eps) * K_ab + (c_mass * float(mfac[a, b])) * vol
            rows = []
            for c in range(d):
                row = []
                for dd in range(d):
                    t = (0.5 * c_eps) * (g[a, dd] * g[b, c] * vol)
                    row.append(t + diag if c == dd else t)
                rows.append(jnp.stack(row))
            return jnp.stack(rows)

        return blk

    fn.block_protocol = True
    return fn


def deformation_elem_mats(coords, elems, c_eps, c_grad, c_mass):
    """(C, C, nl, nl, E) analytic P1 vector element matrices for
    c_eps*eps(u):eps(w) + c_grad*grad(u):grad(w) + c_mass*u.w.

    A[c, d, i, j, e] couples test dof (i, c) with trial dof (j, d)."""
    d = coords.shape[1]
    nl = d + 1
    _, _, Jinv, vol = elem_geometry(coords, elems)
    g = p1_phys_grads(Jinv)  # (nl, d, E)
    K = jnp.einsum("iae,jae->ije", g, g) * vol  # scalar stiffness (nl,nl,E)
    eyeC = jnp.eye(d, dtype=coords.dtype)
    # cross term of eps:eps -> A[c,d,i,j,e] += 0.5*c_eps * g[i,d,e]*g[j,c,e]*vol
    cross = jnp.einsum("ide,jce,e->cdije", g, g, vol)
    A = jnp.einsum("cd,ije->cdije", (c_grad + 0.5 * c_eps) * eyeC, K)
    A = A + 0.5 * c_eps * cross
    # exact P1 mass: int l_i l_j = vol * (1+delta_ij)/((d+1)(d+2))
    mfac = (jnp.ones((nl, nl)) + jnp.eye(nl)) / ((d + 1) * (d + 2))
    A = A + c_mass * jnp.einsum("cd,ij,e->cdije", eyeC, mfac.astype(coords.dtype), vol)
    return A


# ---------------------------------------------------------------------------
# geometric constraint functionals  g(u)  (exact for P1 deformations)
# ---------------------------------------------------------------------------

def elem_grads_of(coords, elems, u):
    """Per-element gradient of a P1 vector field u (C, V): returns
    (G (d, d, E) with G[c, d] = d_d u_c, vol (E,))."""
    _, _, Jinv, vol = elem_geometry(coords, elems)
    g = p1_phys_grads(Jinv)  # (nl, d, E)
    ue = u[:, elems.T]  # (C, nl, E)
    G = jnp.einsum("ide,cie->cde", g, ue)
    return G, vol


def volume_defect(coords, elems, u, ref_volume):
    """g_vol(u) = int det(I + grad u) dx - V_ref.

    Parity: VolumeDefect (2d_admm.lua:773,1122)."""
    G, vol = elem_grads_of(coords, elems, u)
    d = coords.shape[1]
    det = sdet(jnp.eye(d, dtype=coords.dtype)[:, :, None] + G)
    return jnp.sum(vol * det) - ref_volume


def barycenter(coords, elems, u):
    """b_i(u) = int (x_i + u_i) det(I + grad u) dx (unnormalized, (d,)).

    Parity: BarycenterDefect (2d_admm.lua:1123)."""
    G, vol = elem_grads_of(coords, elems, u)
    d = coords.shape[1]
    det = sdet(jnp.eye(d, dtype=coords.dtype)[:, :, None] + G)
    xe = gather_elem(coords, elems) + u[:, elems.T]  # (d, nl, E)
    centroid = xe.mean(axis=1)  # (d, E) exact for linear integrands
    return jnp.einsum("e,ce->c", vol * det, centroid)


def constraints(coords, elems, u, ref_volume, ref_barycenter):
    """g(u) in R^m, m = 1 + d: [volume defect, barycenter defects]."""
    return jnp.concatenate(
        [
            volume_defect(coords, elems, u, ref_volume)[None],
            barycenter(coords, elems, u) - ref_barycenter,
        ]
    )


def constraint_grads(coords, elems, u, ref_volume, ref_barycenter, free_mask):
    """B (m, C, V): gradients of g wrt u (C, V), Dirichlet rows zeroed.

    Replaces the assembled SecondDerivative{Volume,Barycenter} defects
    (2d_admm.lua:937-939); computed by AD so they are exactly consistent
    with `constraints`.  free_mask: (C, V) float."""
    jac = jax.jacrev(lambda uu: constraints(coords, elems, uu, ref_volume, ref_barycenter))(u)
    return jac * free_mask[None]


def constraint_hvp(coords, elems, u, Lmbda, ref_volume, ref_barycenter, x):
    """(sum_i Lambda_i * d2g_i/du2) @ x, via forward-over-reverse AD."""

    def lag(uu):
        g = constraints(coords, elems, uu, ref_volume, ref_barycenter)
        return jnp.vdot(Lmbda, g)

    return jax.jvp(jax.grad(lag), (u,), (x,))[1]


def hvp_elem_mats(coords, elems, u, Lmbda):
    """(C, C, nl, nl, E) element matrices of the constraint Hessian
    sum_k Lambda_k d2g_k/du2 at the frozen Newton iterate (u, Lambda).

    Closed form of the per-element energy
      E_e(u) = vol * det(A) * (L0 + sum_j L_{1+j} cent_j),  A = I + grad u:
      H[c,f,a,b] = vol [ S (dC/dA)[e_f (x) g_b]^{ck} g_a^k
                         + (C g_a)^c L_{1+f}/nl + L_{1+c}/nl (C g_b)^f ]
    with C = cof(A), S = L0 + sum_j L_{1+j} cent_j.  Assembled once per
    Newton iterate into the ELL values (GlobalOps.hess_fn), it replaces
    the forward-over-reverse AD constraint_hvp at every Krylov matvec.
    The patch-lattice counterpart is ops.patchdeform.hvp_corner_block_fn;
    both are FD/AD-validated (tests/test_patch_admm.py, tests/test_admm.py).
    """
    from .patchdeform import _cof, _dcof

    d = coords.shape[1]
    nl = d + 1
    _, _, Jinv, vol = elem_geometry(coords, elems)
    g = p1_phys_grads(Jinv)  # (nl, d, E)
    ue = u[:, elems.T]  # (C, nl, E)
    G = jnp.einsum("cae,ake->cke", ue, g)
    eye = jnp.eye(d, dtype=coords.dtype)[:, :, None]
    A = eye + G  # (d, d, E)
    C_ = _cof(A)
    cent = (gather_elem(coords, elems) + ue).mean(axis=1)  # (d, E)
    S = Lmbda[0] + sum(Lmbda[1 + j] * cent[j] for j in range(d))  # (E,)
    Cg = jnp.einsum("cke,ake->cae", C_, g)  # (C g_a)^c

    K = {}
    for f in range(d):
        for b in range(nl):
            Ef = jnp.zeros_like(A).at[f].set(g[b])  # e_f (x) g_b
            K[(f, b)] = jnp.einsum("cke,ake->cae", _dcof(A, Ef), g)

    out = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.stack(
                                [
                                    vol
                                    * (
                                        S * K[(f, b)][c, a]
                                        + Cg[c, a] * (Lmbda[1 + f] / nl)
                                        + (Lmbda[1 + c] / nl) * Cg[f, b]
                                    )
                                    for b in range(nl)
                                ]
                            )
                            for a in range(nl)
                        ]
                    )
                    for f in range(d)
                ]
            )
            for c in range(d)
        ]
    )
    return out  # (C, C, nl, nl, E)


# ---------------------------------------------------------------------------
# linear RHS:  <J'_s, w> + int (lambda - tau*q*) : grad w dx
# ---------------------------------------------------------------------------

def tensor_rhs(coords, elems, M):
    """Assemble r (C, V): r[c, v] = int M : grad w dx for per-element tensor
    M (d, d, E) with test function w = phi_v e_c.

    Parity: the lambda/q import terms of DeformationEquationRHS
    (2d_admm.lua:437-456)."""
    _, _, Jinv, vol = elem_geometry(coords, elems)
    g = p1_phys_grads(Jinv)  # (nl, d, E)
    contrib = jnp.einsum("e,cde,ide->cie", vol, M, g)  # (C, nl, E)
    C = coords.shape[1]
    V = coords.shape[0]
    seg_ids = elems.T.reshape(-1)  # (nl*E,)

    def seg(v):
        return jax.ops.segment_sum(v, seg_ids, num_segments=V)

    return jax.vmap(seg)(contrib.reshape(C, -1))  # (C, V)


# ---------------------------------------------------------------------------
# z-update prox + dual ascent (exact elementwise)
# ---------------------------------------------------------------------------

def project_frobenius(Q, sigma):
    """Project (d, d, E) tensors onto the Frobenius ball of radius sigma.

    Parity: Testing(q_projected, q, ..., sigma) (2d_admm.lua:897)."""
    nrm = jnp.sqrt(jnp.sum(Q * Q, axis=(0, 1)))
    scale = jnp.minimum(1.0, sigma / jnp.maximum(nrm, 1e-30))
    return Q * scale


def _svals_2x2(Q):
    a, b = Q[0, 0], Q[0, 1]
    c, dd = Q[1, 0], Q[1, 1]
    e1 = jnp.sqrt((a + dd) ** 2 + (c - b) ** 2) * 0.5
    e2 = jnp.sqrt((a - dd) ** 2 + (c + b) ** 2) * 0.5
    return a, b, c, dd, e1, e2


def project_spectral(Q, sigma):
    """Project onto the spectral-norm ball: clamp singular values at sigma.

    Parity: ProjectWithSpectralNorm (2d_admm.lua:902). 2D uses the closed
    form via the rotation/reflection decomposition of 2x2 matrices; 3D uses
    batched SVD."""
    d = Q.shape[0]
    if d == 2:
        a, b, c, dd, e1, e2 = _svals_2x2(Q)
        s1, s2 = e1 + e2, jnp.abs(e1 - e2)  # singular values s1 >= s2 >= 0
        E = 0.5 * jnp.stack([jnp.stack([a + dd, b - c]), jnp.stack([c - b, a + dd])])
        F = 0.5 * jnp.stack([jnp.stack([a - dd, b + c]), jnp.stack([c + b, dd - a])])
        s1c = jnp.minimum(s1, sigma)
        s2c = jnp.minimum(s2, sigma)
        sgn = jnp.sign(e1 - e2)
        e1c = 0.5 * (s1c + sgn * s2c)
        e2c = 0.5 * (s1c - sgn * s2c)
        rE = jnp.where(e1 > 1e-30, e1c / jnp.maximum(e1, 1e-30), 1.0)
        rF = jnp.where(e2 > 1e-30, e2c / jnp.maximum(e2, 1e-30), 1.0)
        return E * rE + F * rF
    Qe = jnp.moveaxis(Q, -1, 0)  # (E, d, d) only for the lapack-style SVD
    U, S, Vt = jnp.linalg.svd(Qe)
    Sc = jnp.minimum(S, sigma)
    out = jnp.einsum("eij,ej,ejk->eik", U, Sc, Vt)
    return jnp.moveaxis(out, 0, -1)


def max_frobenius_norm(coords, elems, u):
    """max_e ||grad u||_F.  Parity: MaximumFrobeniusNorm (2d_admm.lua:898)."""
    G, _ = elem_grads_of(coords, elems, u)
    return jnp.max(jnp.sqrt(jnp.sum(G * G, axis=(0, 1))))


def max_spectral_norm(coords, elems, u):
    """max_e sigma_max(grad u).  Parity: MaxSpectralNorm (2d_admm.lua:901)."""
    G, _ = elem_grads_of(coords, elems, u)
    if coords.shape[1] == 2:
        _, _, _, _, e1, e2 = _svals_2x2(G)
        return jnp.max(e1 + e2)
    s = jnp.linalg.svd(jnp.moveaxis(G, -1, 0), compute_uv=False)
    return jnp.max(s[:, 0])


def z_update(coords, elems, u, lam, tau, sigma, norm_name="frobenius"):
    """q* = Proj_sigma( grad u |_e + lambda_e / tau ).  (d, d, E).

    Collapses the reference's MassModel assembly + CG solve + projection
    (2d_admm.lua:883-905) into exact elementwise arithmetic: on a
    piecewise-constant space the mass matrix is diag(vol_e) so the mass solve
    is a no-op division."""
    G, _ = elem_grads_of(coords, elems, u)
    Q = G + lam / tau
    if norm_name == "spectral":
        return project_spectral(Q, sigma)
    return project_frobenius(Q, sigma)


def dual_update(coords, elems, u, lam, q_proj, tau):
    """lambda <- lambda + tau*(grad u - q*); returns (new lam, increment).

    Parity: LambdaUpdate assembly + VecScaleAdd2 (2d_admm.lua:1181-1185)."""
    G, _ = elem_grads_of(coords, elems, u)
    inc = tau * (G - q_proj)
    return lam + inc, inc
