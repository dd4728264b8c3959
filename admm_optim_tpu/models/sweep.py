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


def sigma_sweep(prob, X, Jp, sigmas, scalings=None):
    """Run the ADMM inner solver for a batch of (sigma, scaling) candidates
    on a fixed geometry.  Returns the batched ADMMState (leading axis B).

    prob: models.obstacle.ObstacleShapeOpt; X (V, d); Jp (C, V);
    sigmas (B,); scalings (B,) or None (ones)."""
    if scalings is None:
        scalings = jnp.ones_like(sigmas)
    mgdata = prob._assemble(X)

    if prob.use_patch:
        from ..ops import patchstencil as pst

        coords_p = pst.to_patch(prob.patchset.fine, X.T)
        Jp_p = pst.to_patch(prob.patchset.fine, Jp)

        n_vertices = X.shape[0]

        def one(sigma, scaling):
            import dataclasses as _dc

            ops_ = prob._patch_ops_builder(mgdata, coords_p)
            st = admm.admm_inner_ops(
                prob.cfg.admm, ops_, Jp_p, sigma, scaling,
                prob.ref_volume, prob.ref_barycenter,
            )
            # public contract: u in the GLOBAL (C, V) representation
            u_g = pst.from_patch(prob.patchset.fine, st.u, n_vertices, mode="owner")
            return _dc.replace(st, u=u_g)

    else:

        def one(sigma, scaling):
            return admm.admm_inner(
                prob.cfg.admm, prob.struct, mgdata, X, prob.elems, prob.free, Jp,
                sigma, scaling, prob.ref_volume, prob.ref_barycenter,
            )

    return jax.jit(jax.vmap(one))(jnp.asarray(sigmas), jnp.asarray(scalings))


def geometry_sweep(prob, Xs, Jps, sigma, scaling=1.0):
    """Run the ADMM inner solver for a batch of geometries (B, V, d) with
    per-geometry shape gradients (B, C, V).  Per-geometry multigrid data is
    assembled under the same vmap (the per-level jits inline)."""

    a = prob.cfg.admm

    def one(X, Jp):
        mgdata = prob.def_space.assemble_mg(
            prob.struct, X, a.c_eps, a.tau, a.c_mass
        )
        return admm.admm_inner(
            prob.cfg.admm, prob.struct, mgdata, X, prob.elems, prob.free, Jp,
            jnp.asarray(sigma), jnp.asarray(scaling),
            prob.ref_volume, prob.ref_barycenter,
        )

    return jax.jit(jax.vmap(one))(jnp.asarray(Xs), jnp.asarray(Jps))


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
