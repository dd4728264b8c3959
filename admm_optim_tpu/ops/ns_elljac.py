"""Assembled NS Jacobian on unstructured (.ugx) meshes.

The brick-lattice assembled Jacobian (ops.ns_patchjac) is the NS fast path,
but the reference's own grids (grids/refined.ugx, grids/box_3D_elongated.ugx,
loaded per 2d_admm.lua:131-132) carry no brick metadata, so on them the
Newton/GMRES and adjoint loops previously fell back to matrix-free
``jax.jvp`` / ``jax.vjp`` of the quadrature residual - re-running the full
element loop (forward AND reverse sweep for the adjoint) on every Krylov
iteration.  Measured on the flagship 3D refs=2 configuration that fallback
costs 312 ms/adjoint-iteration vs 30 ms/iteration for the identical solver
on a brick mesh (docs/ROADMAP.md round-4 log).

This module is the reference's assemble-once strategy (AssembledOperator +
assemble_jacobian, 2d_admm.lua:271, obstacle_optim_util.lua:46-68) for
unstructured meshes:

 * per-element local Jacobian blocks ``W (nloc, nloc, E)`` produced by
   ``jax.jacfwd`` of the element-local residual kernel
   (ops.navier_stokes.ns_elem_residual) at the frozen Newton iterate -
   exactly the discrete Jacobian, convection linearization included;
 * the matvec is gather (nloc local dofs per element) -> one batched
   (nloc x nloc) block einsum over elements -> segment_sum scatter.  The
   element axis stays minor-most (ops.sparsity layout notes), so W streams
   from HBM at full bandwidth and the einsum is pure VPU work;
 * the TRANSPOSE apply reuses W with the einsum flipped, giving the adjoint
   solve (J^T, parity: ADMMNavierStokesAdjoint, 2d_admm.lua:286-297) an
   assembled fast path with NO reverse-mode sweep;
 * the stored velocity-pressure sub-block gives the block preconditioner's
   B^T (and B) coupling as one small einsum instead of the two full
   residual evaluations of solvers.ns_solver._bt_coupling.

Dirichlet semantics match ns_residual's row replacement: J = F + (I-F) J_g
with F the fixed-velocity row selector, so the forward apply overwrites
fixed rows with x and the transpose apply is J^T = F + J_g^T (I-F).

Memory: W is nloc^2 floats per element (3D Taylor-Hood: nloc = 3*10+4 = 34,
~4.6 KB/element in f32; the flagship refs=2 grid's 77.8k elements need
~360 MB).  Callers gate on ``jac_memory_bytes`` (models.obstacle falls back
to the matrix-free path above the cap).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import navier_stokes as nsops

JAC_ELEM_CHUNK = 4096  # elements per jacfwd batch: bounds (nq,nbv,d,B) temps


@dataclasses.dataclass(frozen=True)
class EllJacWiring:
    """Static (host) wiring: packed-state dof index per element-local dof.

    Local dof order matches NSSpace packing and ops.ns_patchjac: velocity
    component-major (c*nbv + b), then the d+1 pressure corners."""

    dim: int
    nbv: int
    nl: int
    E: int
    n_state: int
    loc_idx: np.ndarray  # (nloc, E) int32 into the packed state
    fixed_state: np.ndarray  # (n_state,) bool - Dirichlet rows (velocity)

    @property
    def nloc(self) -> int:
        return self.dim * self.nbv + self.nl


def build_wiring(space) -> EllJacWiring:
    d = space.dim
    vel_dofs = np.asarray(space.vel_dofs)  # (E, nbv)
    elems = np.asarray(space.elems)  # (E, nl)
    E, nbv = vel_dofs.shape
    nl = elems.shape[1]
    vel = (
        np.arange(d, dtype=np.int64)[:, None, None] * space.n_vel
        + vel_dofs.T[None, :, :]
    )  # (d, nbv, E)
    pr = d * space.n_vel + elems.T  # (nl, E)
    loc_idx = np.concatenate([vel.reshape(d * nbv, E), pr], axis=0)
    fixed_state = np.concatenate(
        [
            np.tile(np.asarray(space.vel_fixed), d),
            np.zeros(space.n_pressure, dtype=bool),
        ]
    )
    return EllJacWiring(
        dim=d,
        nbv=nbv,
        nl=nl,
        E=E,
        n_state=space.n_state,
        loc_idx=loc_idx.astype(np.int32),
        fixed_state=fixed_state,
    )


def jac_memory_bytes(wiring: EllJacWiring, itemsize: int = 4) -> int:
    return wiring.nloc**2 * wiring.E * itemsize


def assemble_ns_jacobian(
    space, wiring: EllJacWiring, coords, s, visc, stab: float = 0.0
):
    """W (nloc, nloc, E): exact per-element Jacobian blocks at (coords, s).

    Chunked jacfwd of the element-local residual (the same single source of
    truth the residual/patch assembly use), element axis minor-most."""
    d, nl, nloc = wiring.dim, wiring.nl, wiring.nloc
    x_all = coords.T[:, jnp.asarray(space.elems).T]  # (d, nl, E)
    u_all = s[jnp.asarray(wiring.loc_idx)]  # (nloc, E)

    def f_single(u, x):
        ve = u[: d * wiring.nbv].reshape(d, wiring.nbv)
        pe = u[d * wiring.nbv :]
        r_mom, r_div = nsops.ns_elem_residual(
            space, x[..., None], ve[..., None], pe[..., None], visc, stab
        )
        return jnp.concatenate([r_mom.reshape(-1), r_div.reshape(-1)])

    jac_single = jax.jacfwd(f_single, argnums=0)  # (nloc, nloc)
    jac_batch = jax.vmap(jac_single, in_axes=(-1, -1), out_axes=-1)

    E = wiring.E
    nb = max(1, -(-E // JAC_ELEM_CHUNK))
    block = -(-E // nb)
    pad = nb * block - E
    u_p = jnp.pad(u_all, ((0, 0), (0, pad)))
    # pad with element-0 geometry (degenerate zero coords would make Jinv
    # infinite and poison jacfwd with NaN * 0)
    x_p = jnp.concatenate(
        [x_all, jnp.broadcast_to(x_all[:, :, :1], (d, nl, pad))], axis=2
    )
    shp = lambda a: jnp.moveaxis(a.reshape(a.shape[:-1] + (nb, block)), -2, 0)

    def body(args):
        ub, xb = args
        return jac_batch(ub, xb)

    Wb = jax.lax.map(body, (shp(u_p), shp(x_p)))  # (nb, nloc, nloc, block)
    return jnp.moveaxis(Wb, 0, -2).reshape(nloc, nloc, nb * block)[:, :, :E]


def make_assemble_fn(space, wiring: EllJacWiring, stab: float = 0.0):
    def assemble(coords, s, visc):
        return assemble_ns_jacobian(space, wiring, coords, s, visc, stab)

    return assemble


def make_matvec_fns(space, wiring: EllJacWiring):
    """Packed-state (n_state,) matvec closures (jv, jtv), each (x, W)."""
    loc_idx = jnp.asarray(wiring.loc_idx)
    flat_idx = loc_idx.reshape(-1)
    fixed = jnp.asarray(wiring.fixed_state)
    n_state = wiring.n_state

    def jv(x, W):
        x_loc = x[loc_idx]  # (nloc, E)
        y_loc = jnp.einsum("abe,be->ae", W, x_loc)
        y = jax.ops.segment_sum(
            y_loc.reshape(-1), flat_idx, num_segments=n_state
        )
        return jnp.where(fixed, x, y)

    def jtv(x, W):
        xm = jnp.where(fixed, 0.0, x)
        x_loc = xm[loc_idx]
        y_loc = jnp.einsum("bae,be->ae", W, x_loc)
        y = jax.ops.segment_sum(
            y_loc.reshape(-1), flat_idx, num_segments=n_state
        )
        return y + jnp.where(fixed, x, 0.0)

    return jv, jtv


def make_bt_fn(space, wiring: EllJacWiring):
    """(zp (n_p,), W) -> B^T zp (d, n_vel): pressure-gradient coupling into
    the momentum rows from the stored sub-blocks W[:d*nbv, d*nbv:], fixed
    rows zeroed - exactly what the residual-difference form
    (solvers.ns_solver._bt_coupling) computes at a fraction of the cost."""
    d, nbv, nl = wiring.dim, wiring.nbv, wiring.nl
    vel_idx = jnp.asarray(wiring.loc_idx[: d * nbv])  # (d*nbv, E)
    p_elems = jnp.asarray(np.asarray(space.elems).T)  # (nl, E)
    vfix = jnp.asarray(np.tile(np.asarray(space.vel_fixed), d))

    def bt(zp, W):
        p_loc = zp[p_elems]  # (nl, E)
        y_loc = jnp.einsum("abe,be->ae", W[: d * nbv, d * nbv :], p_loc)
        yv = jax.ops.segment_sum(
            y_loc.reshape(-1), vel_idx.reshape(-1),
            num_segments=d * space.n_vel,
        )
        yv = jnp.where(vfix, 0.0, yv)
        return yv.reshape(d, space.n_vel)

    return bt


def make_b_fn(space, wiring: EllJacWiring):
    """(zv (d, n_vel), W) -> (B^T)^T zv (n_p,): the exact transpose of
    make_bt_fn's coupling (velocity -> pressure through the same stored
    sub-blocks, fixed velocity entries masked FIRST).  Used by the
    hand-transposed block preconditioner (solvers.ns_solver.ns_gmg_MT)."""
    d, nbv = wiring.dim, wiring.nbv
    vel_idx = jnp.asarray(wiring.loc_idx[: d * nbv])  # (d*nbv, E)
    p_elems = jnp.asarray(np.asarray(space.elems).T)  # (nl, E)
    vfix = jnp.asarray(np.tile(np.asarray(space.vel_fixed), d))

    def b(zv, W):
        zvf = jnp.where(vfix, 0.0, zv.reshape(-1))
        v_loc = zvf[vel_idx]  # (d*nbv, E)
        y_loc = jnp.einsum("abe,ae->be", W[: d * nbv, d * nbv :], v_loc)
        return jax.ops.segment_sum(
            y_loc.reshape(-1), p_elems.reshape(-1),
            num_segments=space.n_pressure,
        )

    return b
