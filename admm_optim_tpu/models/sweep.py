"""Batched design sweeps: vmap the ADMM solver over sigma/scaling schedules
or over geometry perturbations - many design candidates per chip in one
compiled program.

This is a capability the reference cannot express (one MPI job per design);
BASELINE.md lists "vmap 64 geometries / rho-schedules on 1 chip" as a
north-star target.  The whole ADMM inner solver (optim.admm.admm_inner) is a
pure jittable function of (geometry, J', sigma, scaling), so sweeping is one
jax.vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..optim import admm


def _sigma_sweep_kernel(prob):
    """Cached jitted sweep kernel: all per-call arrays (mgdata, geometry,
    J', candidate vectors) are explicit TRACED arguments, so repeated
    sweeps — and in particular repeated single-candidate calls — reuse one
    compiled program instead of re-jitting a fresh closure every call."""
    cache = prob.__dict__.setdefault("_sweep_jit_cache", {})
    key = "sigma_patch" if prob.use_patch else "sigma_global"
    if key in cache:
        return cache[key]

    if prob.use_patch:
        from ..ops import patchstencil as pst

        fine = prob.patchset.fine

        def f(mgdata, coords_p, Jp_p, sigmas, scalings, n_vertices):
            def one(sigma, scaling):
                import dataclasses as _dc

                ops_ = prob._patch_ops_builder(mgdata, coords_p)
                st = admm.admm_inner_ops(
                    prob.cfg.admm, ops_, Jp_p, sigma, scaling,
                    prob.ref_volume, prob.ref_barycenter,
                )
                # public contract: u in the GLOBAL (C, V) representation
                u_g = pst.from_patch(fine, st.u, n_vertices, mode="owner")
                return _dc.replace(st, u=u_g)

            return jax.vmap(one)(sigmas, scalings)

        cache[key] = jax.jit(f, static_argnums=(5,))
    else:

        def f(mgdata, X, Jp, sigmas, scalings):
            def one(sigma, scaling):
                return admm.admm_inner(
                    prob.cfg.admm, prob.struct, mgdata, X, prob.elems,
                    prob.free, Jp, sigma, scaling,
                    prob.ref_volume, prob.ref_barycenter,
                )

            return jax.vmap(one)(sigmas, scalings)

        cache[key] = jax.jit(f)
    return cache[key]


def sigma_sweep(prob, X, Jp, sigmas, scalings=None):
    """Run the ADMM inner solver for a batch of (sigma, scaling) candidates
    on a fixed geometry.  Returns the batched ADMMState (leading axis B).

    prob: models.obstacle.ObstacleShapeOpt; X (V, d); Jp (C, V);
    sigmas (B,); scalings (B,) or None (ones)."""
    if scalings is None:
        scalings = jnp.ones_like(sigmas)
    mgdata = prob._assemble(X)
    kern = _sigma_sweep_kernel(prob)
    sigmas = jnp.asarray(sigmas)
    scalings = jnp.asarray(scalings)

    if prob.use_patch:
        from ..ops import patchstencil as pst

        coords_p = pst.to_patch(prob.patchset.fine, X.T)
        Jp_p = pst.to_patch(prob.patchset.fine, Jp)
        return kern(mgdata, coords_p, Jp_p, sigmas, scalings, X.shape[0])
    return kern(mgdata, X, Jp, sigmas, scalings)


def geometry_sweep(prob, Xs, Jps, sigma, scaling=1.0):
    """Run the ADMM inner solver for a batch of geometries (B, V, d) with
    per-geometry shape gradients (B, C, V).  Per-geometry multigrid data is
    assembled under the same vmap (the per-level jits inline)."""

    cache = prob.__dict__.setdefault("_sweep_jit_cache", {})
    key = "geometry"
    if key not in cache:
        a = prob.cfg.admm

        def f(Xs, Jps, sigma, scaling):
            def one(X, Jp):
                mgdata = prob.def_space.assemble_mg(
                    prob.struct, X, a.c_eps, a.tau, a.c_mass
                )
                return admm.admm_inner(
                    a, prob.struct, mgdata, X, prob.elems, prob.free, Jp,
                    sigma, scaling, prob.ref_volume, prob.ref_barycenter,
                )

            return jax.vmap(one)(Xs, Jps)

        cache[key] = jax.jit(f)
    return cache[key](
        jnp.asarray(Xs), jnp.asarray(Jps), jnp.asarray(sigma),
        jnp.asarray(scaling),
    )


def best_candidate(prob, X, s, states):
    """Evaluate the drag of each candidate deformation in a batched
    ADMMState by re-solving NS on each deformed mesh; returns
    (index, drags).  Candidates that failed get +inf."""
    import numpy as np

    B = states.u.shape[0]
    drags = []
    for b in range(B):
        if bool(states.failed[b]) or not bool(states.converged[b]):
            drags.append(float("inf"))
            continue
        X_new = X + states.u[b].T
        s_new, _, _, conv = prob._ns_solve(X_new, s)
        drags.append(float(prob._drag(X_new, s_new)) if bool(conv) else float("inf"))
    drags = np.asarray(drags)
    return int(np.argmin(drags)), drags
