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
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import elem_geometry, p1_phys_grads, sdet


# ---------------------------------------------------------------------------
# element matrices for the constant SPD part  a(u,w) + tau * (grad u, grad w)
# ---------------------------------------------------------------------------

def deformation_elem_mats(coords, elems, c_eps, c_grad, c_mass):
    """(E, nl, C, nl, C) analytic P1 vector element matrices for
    c_eps*eps(u):eps(w) + c_grad*grad(u):grad(w) + c_mass*u.w."""
    d = coords.shape[1]
    nl = d + 1
    _, _, Jinv, vol = elem_geometry(coords, elems)
    g = p1_phys_grads(Jinv)  # (E, nl, d)
    K = jnp.einsum("eic,ejc->eij", g, g) * vol[:, None, None]  # scalar stiffness
    G = jnp.einsum("eid,ejc->eicjd", g, g) * vol[:, None, None, None, None]
    # wait: eps term cross part is int d_{d'}phi_i d_c phi_j -> test (i,c), trial (j,d'):
    # A[i,c,j,dp] += 0.5*int d_{dp}phi_i * d_c phi_j
    cross = jnp.einsum("eib,ejc->eicjb", g, g)  # A[i,c,j,b] = g_i[b] * g_j[c]
    eyeC = jnp.eye(d)
    A = (
        c_grad * jnp.einsum("eij,cd->eicjd", K, eyeC)
        + c_eps * 0.5 * jnp.einsum("eij,cd->eicjd", K, eyeC)
        + c_eps * 0.5 * cross * vol[:, None, None, None, None]
    )
    # exact P1 mass: int l_i l_j = vol * (1+delta_ij)/((d+1)(d+2))
    mfac = (jnp.ones((nl, nl)) + jnp.eye(nl)) / ((d + 1) * (d + 2))
    M = vol[:, None, None] * mfac
    A = A + c_mass * jnp.einsum("eij,cd->eicjd", M, eyeC)
    return A


# ---------------------------------------------------------------------------
# geometric constraint functionals  g(u)  (exact for P1 deformations)
# ---------------------------------------------------------------------------

def elem_grads_of(coords, elems, u):
    """Per-element gradient of a P1 vector field: (E, d, d), G[c,d]=d_d u_c."""
    _, _, Jinv, vol = elem_geometry(coords, elems)
    g = p1_phys_grads(Jinv)
    G = jnp.einsum("eid,eic->ecd", g, u[elems])
    return G, vol


def volume_defect(coords, elems, u, ref_volume):
    """g_vol(u) = int det(I + grad u) dx - V_ref.

    Parity: VolumeDefect (2d_admm.lua:773,1122)."""
    G, vol = elem_grads_of(coords, elems, u)
    d = coords.shape[1]
    det = sdet(jnp.eye(d)[None] + G)
    return jnp.sum(vol * det) - ref_volume


def barycenter(coords, elems, u):
    """b_i(u) = int (x_i + u_i) det(I + grad u) dx (unnormalized, (d,)).

    Parity: BarycenterDefect (2d_admm.lua:1123)."""
    G, vol = elem_grads_of(coords, elems, u)
    d = coords.shape[1]
    det = sdet(jnp.eye(d)[None] + G)
    centroid = (coords[elems] + u[elems]).mean(axis=1)  # (E, d) exact for linear
    return jnp.einsum("e,ec->c", vol * det, centroid)


def constraints(coords, elems, u, ref_volume, ref_barycenter):
    """g(u) in R^m, m = 1 + d: [volume defect, barycenter defects]."""
    return jnp.concatenate(
        [
            volume_defect(coords, elems, u, ref_volume)[None],
            barycenter(coords, elems, u) - ref_barycenter,
        ]
    )


def constraint_grads(coords, elems, u, ref_volume, ref_barycenter, free_mask):
    """B (m, V, d): gradients of g wrt u, Dirichlet rows zeroed.

    Replaces the assembled SecondDerivative{Volume,Barycenter} defects
    (2d_admm.lua:937-939); computed by AD so they are exactly consistent
    with `constraints`."""
    jac = jax.jacrev(lambda uu: constraints(coords, elems, uu, ref_volume, ref_barycenter))(u)
    return jac * free_mask[None]  # free_mask: (V, C)


def constraint_hvp(coords, elems, u, Lmbda, ref_volume, ref_barycenter, x):
    """(sum_i Lambda_i * d2g_i/du2) @ x, via forward-over-reverse AD."""

    def lag(uu):
        g = constraints(coords, elems, uu, ref_volume, ref_barycenter)
        return jnp.vdot(Lmbda, g)

    return jax.jvp(jax.grad(lag), (u,), (x,))[1]


# ---------------------------------------------------------------------------
# linear RHS:  <J'_s, w> + int (lambda - tau*q*) : grad w dx
# ---------------------------------------------------------------------------

def tensor_rhs(coords, elems, M):
    """Assemble r[i,c] = int M : grad w dx for per-element tensor M (E,d,d)
    with test function w = phi_i e_c, i.e. r[v,c] = sum_e vol_e M[e,c,:].g_v.

    Parity: the lambda/q import terms of DeformationEquationRHS
    (2d_admm.lua:437-456)."""
    _, _, Jinv, vol = elem_geometry(coords, elems)
    g = p1_phys_grads(Jinv)  # (E, nl, d)
    contrib = jnp.einsum("e,ecd,eid->eic", vol, M, g)  # (E, nl, d=C)
    V = coords.shape[0]
    return jax.ops.segment_sum(
        contrib.reshape(-1, coords.shape[1]), elems.reshape(-1), num_segments=V
    )


# ---------------------------------------------------------------------------
# z-update prox + dual ascent (exact elementwise)
# ---------------------------------------------------------------------------

def project_frobenius(Q, sigma):
    """Project (E,d,d) tensors onto the Frobenius ball of radius sigma.

    Parity: Testing(q_projected, q, ..., sigma) (2d_admm.lua:897)."""
    nrm = jnp.sqrt(jnp.sum(Q * Q, axis=(-2, -1)))
    scale = jnp.minimum(1.0, sigma / jnp.maximum(nrm, 1e-300))
    return Q * scale[..., None, None]


def project_spectral(Q, sigma):
    """Project onto the spectral-norm ball: clamp singular values at sigma.

    Parity: ProjectWithSpectralNorm (2d_admm.lua:902). 2D uses the closed
    form via the Frobenius decomposition of 2x2 matrices; 3D uses batched SVD.
    """
    d = Q.shape[-1]
    if d == 2:
        # 2x2 SVD via rotation decomposition: s_max/min = |E| +- |F| with
        # E = (a+d)/2,(c-b)/2; F = (a-d)/2,(c+b)/2 (standard closed form)
        a, b = Q[..., 0, 0], Q[..., 0, 1]
        c, dd = Q[..., 1, 0], Q[..., 1, 1]
        e1 = jnp.sqrt(((a + dd) ** 2 + (c - b) ** 2)) * 0.5
        e2 = jnp.sqrt(((a - dd) ** 2 + (c + b) ** 2)) * 0.5
        s1, s2 = e1 + e2, jnp.abs(e1 - e2)  # s1 >= s2 >= 0
        # decompose Q = E + F with E = e1*R (rotation part), F = e2*S
        # (reflection part); rescale each so the singular values clamp.
        half = 0.5
        E = jnp.stack([jnp.stack([a + dd, b - c], -1), jnp.stack([c - b, a + dd], -1)], -2) * half
        F = jnp.stack([jnp.stack([a - dd, b + c], -1), jnp.stack([c + b, dd - a], -1)], -2) * half
        # singular values are e1 +/- e2 with |E| = e1, |F| = e2 (scaled frob)
        # scale E and F so that new (e1', e2') give clamped (s1', s2')
        s1c = jnp.minimum(s1, sigma)
        s2c = jnp.minimum(s2, sigma)
        e1c = 0.5 * (s1c + jnp.sign(e1 - e2) * s2c)
        e2c = 0.5 * (s1c - jnp.sign(e1 - e2) * s2c)
        rE = jnp.where(e1 > 1e-300, e1c / jnp.maximum(e1, 1e-300), 1.0)
        rF = jnp.where(e2 > 1e-300, e2c / jnp.maximum(e2, 1e-300), 1.0)
        return E * rE[..., None, None] + F * rF[..., None, None]
    U, S, Vt = jnp.linalg.svd(Q)
    Sc = jnp.minimum(S, sigma)
    return jnp.einsum("...ij,...j,...jk->...ik", U, Sc, Vt)


def max_frobenius_norm(coords, elems, u):
    """max_e ||grad u||_F.  Parity: MaximumFrobeniusNorm (2d_admm.lua:898)."""
    G, _ = elem_grads_of(coords, elems, u)
    return jnp.max(jnp.sqrt(jnp.sum(G * G, axis=(-2, -1))))


def max_spectral_norm(coords, elems, u):
    """max_e sigma_max(grad u).  Parity: MaxSpectralNorm (2d_admm.lua:901)."""
    G, _ = elem_grads_of(coords, elems, u)
    if coords.shape[1] == 2:
        a, b = G[..., 0, 0], G[..., 0, 1]
        c, dd = G[..., 1, 0], G[..., 1, 1]
        e1 = jnp.sqrt(((a + dd) ** 2 + (c - b) ** 2)) * 0.5
        e2 = jnp.sqrt(((a - dd) ** 2 + (c + b) ** 2)) * 0.5
        return jnp.max(e1 + e2)
    s = jnp.linalg.svd(G, compute_uv=False)
    return jnp.max(s[..., 0])


def z_update(coords, elems, u, lam, tau, sigma, norm_name="frobenius"):
    """q* = Proj_sigma( grad u |_e + lambda_e / tau ).  (E, d, d).

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
