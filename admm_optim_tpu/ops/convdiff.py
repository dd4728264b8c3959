"""P1 convection-diffusion element matrices for the NS velocity-block
preconditioner.

The reference preconditions the NS Jacobian with GMG whose smoother sweeps
see the full convection-diffusion coupling (assembled Jacobian + rap,
obstacle_optim_util.lua:46-68).  Our velocity-block V-cycle therefore also
needs the convection term at low viscosity: with nu*Laplacian alone the
Krylov iteration count grows like O(1/nu).

For P1 fields everything is closed-form: with w the (frozen) advecting
velocity, elementwise

    A[i,j] = nu * vol * g_i.g_j  +  int_T (w . grad phi_j) phi_i dx
           = nu * vol * g_i.g_j  +  g_j . (sum_k mfac[i,k] w_k) * vol

since grad phi_j is constant and w is P1 (mfac = exact P1 mass factors).
The operator acts identically on each velocity component (block-diagonal in
components).  Layouts follow ops.geometry (element axis last).
"""
from __future__ import annotations

import jax.numpy as jnp

from .geometry import corner_geometry, elem_geometry, p1_phys_grads


def convdiff_corner_mats(cw, visc, art_diff=True, ncomp=None):
    """Like convdiff_elem_mats but from explicit corner data for the
    brick-patch stencil assembly (ops.patchstencil.assemble_w).

    cw: (2d, nl, ...) stacked per-corner positions (rows :d) and advecting
    velocity values (rows d:) - the patch assembly slices all channels of
    its lattice array identically, so geometry and the frozen velocity
    travel together."""
    d = cw.shape[0] // 2
    x, w = cw[:d], cw[d:]
    C = d if ncomp is None else ncomp
    nl = d + 1
    _, _, Jinv, vol = corner_geometry(x)
    g = p1_phys_grads(Jinv)  # (nl, d, ...)
    mfac = ((jnp.ones((nl, nl)) + jnp.eye(nl)) / ((d + 1) * (d + 2))).astype(cw.dtype)
    wbar = jnp.einsum("ik,dk...->di...", mfac, w)
    Cmat = jnp.einsum("jd...,di...,...->ij...", g, wbar, vol)
    eyeC = jnp.eye(C, dtype=cw.dtype)
    if art_diff:
        h = vol ** (1.0 / d)
        wmag = jnp.sqrt(jnp.sum(w.mean(axis=1) ** 2, axis=0))
        nu_eff = visc + 0.5 * wmag * h
        K = jnp.einsum("ia...,ja...,...->ij...", g, g, vol * nu_eff)
        return jnp.einsum("cd,ij...->cdij...", eyeC, K + Cmat)
    K = jnp.einsum("ia...,ja...->ij...", g, g) * vol
    return jnp.einsum("cd,ij...->cdij...", eyeC, visc * K + Cmat)


def convdiff_elem_mats(coords, elems, w, visc, art_diff=True, ncomp=None):
    """(C, C, nl, nl, E) element matrices of nu_eff*grad:grad + (w.grad u, v).

    w: (d, V) advecting velocity at the mesh vertices (P1).
    art_diff: add first-order artificial diffusion nu_art = |w|_e h_e / 2 to
    the PRECONDITIONER operator - plain Galerkin convection at cell Peclet
    > 1 is not smoothable by Jacobi-type sweeps; the stabilized surrogate is
    (the solved system itself stays plain Galerkin; this operator only ever
    preconditions).
    ncomp: block size C (default d: the component-diagonal velocity
    operator); ncomp=1 gives the scalar operator (e.g. the PCD pressure
    convection-diffusion Fp / Laplacian Ap, solvers.ns_solver)."""
    d = coords.shape[1]
    C = d if ncomp is None else ncomp
    nl = d + 1
    _, _, Jinv, vol = elem_geometry(coords, elems)
    g = p1_phys_grads(Jinv)  # (nl, d, E)
    K = jnp.einsum("iae,jae->ije", g, g) * vol  # (nl, nl, E)
    we = w[:, elems.T]  # (d, nl, E)
    mfac = ((jnp.ones((nl, nl)) + jnp.eye(nl)) / ((d + 1) * (d + 2))).astype(coords.dtype)
    wbar = jnp.einsum("ik,dke->die", mfac, we)  # int w phi_i / vol
    Cmat = jnp.einsum("jde,die,e->ije", g, wbar, vol)
    eyeC = jnp.eye(C, dtype=coords.dtype)
    if art_diff:
        h = vol ** (1.0 / d)
        wmag = jnp.sqrt(jnp.sum(we.mean(axis=1) ** 2, axis=0))
        nu_eff = visc + 0.5 * wmag * h  # (E,)
        K = jnp.einsum("iae,jae,e->ije", g, g, vol * nu_eff)
        return jnp.einsum("cd,ije->cdije", eyeC, K + Cmat)
    return jnp.einsum("cd,ije->cdije", eyeC, visc * K + Cmat)
