"""Assembled NS Jacobian on the brick-patch lattice (gather-free matvec).

The NS Newton/GMRES inner loop applies J(s0) to a Krylov vector every
iteration.  The matrix-free ``jax.jvp`` of ``ns_residual`` re-runs the full
quadrature element loop (with its per-element dof gathers) per application;
the reference instead assembles its Jacobian once per Newton step and
applies a stored sparse operator (AssembledOperator + assemble_jacobian,
2d_admm.lua:271, obstacle_optim_util.lua:46-68).  This module is the
TPU-native version of that assemble-once strategy on brick-lattice meshes
(core.patches):

 * P2 velocity dofs are exactly the vertices of the once-refined lattice
   (the P1-iso-P2 identity used by solvers.ns_solver.ns_gmg_precond_data),
   so a velocity Krylov vector is a dense ``(d, *lat_fine, P)`` array and
   the 4+6 (2D: 3+3) local dofs of every level-k element sit at FIXED
   lattice offsets per element class - reads/writes are static strided
   slices, zero gather/scatter.
 * Per element class c the local Jacobian blocks ``W[c]`` (nloc x nloc per
   cell) are produced by ``jax.jacfwd`` of the element-local residual
   kernel (ops.navier_stokes.ns_elem_residual) - exactly the discrete
   Jacobian, convection linearization included.
 * The apply is one einsum per class (a batched (nloc x nloc) matvec over
   cells - pure VPU work streaming W once from HBM) plus the
   additive->consistent boundary exchange (ops.patchstencil.exchange_sum),
   the on-chip analogue of UG4's storage-type protocol (2d_admm.lua:904).
 * The TRANSPOSE apply reuses the same W with the einsum transposed -
   giving the adjoint solve (J^T) an assembled fast path too
   (parity: ADMMNavierStokesAdjoint, 2d_admm.lua:286-297).

Memory: W is nclass*nloc^2 floats per lattice cell (3D: 6*34^2 = 6.9k,
i.e. ~28 KB/cell in f32).  This is the price of assemble-once; callers
gate on problem size (models.obstacle caps it and falls back to the
matrix-free jvp path).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import TET_EDGES, TRI_EDGES
from . import navier_stokes as nsops
from . import patchstencil as pst


@dataclasses.dataclass(frozen=True)
class NSJacWiring:
    """Static lattice wiring of the packed NS local dofs per element class.

    Local dof order matches NSSpace packing: velocity component-major
    (c*nbv + b), then the d+1 pressure corners; the velocity node order is
    [canonical corners] + [canonical edges in combinations order], matching
    the P2 tables (core.spaces.p2_tab / p2_elem_dofs convention)."""

    dim: int
    nbv: int  # P2 nodes per element
    nl: int  # P1 corners per element (= dim+1)
    nclass: int
    vel_offs: tuple  # (nclass, nbv, dim) fine-lattice offsets in {0,1,2}
    p_offs: tuple  # (nclass, nl, dim) coarse-lattice offsets in {0,1}

    @property
    def nloc(self) -> int:
        return self.dim * self.nbv + self.nl


def build_wiring(ps) -> NSJacWiring:
    """Wiring from a level-k PatchSet (core.patches.build_patchset)."""
    d = ps.dim
    co = np.asarray(ps.class_offsets, dtype=np.int64)  # (nclass, nl, d)
    pairs = TET_EDGES if d == 3 else TRI_EDGES
    vel = np.concatenate(
        [2 * co, co[:, pairs[:, 0]] + co[:, pairs[:, 1]]], axis=1
    )  # (nclass, nbv, d)
    return NSJacWiring(
        dim=d,
        nbv=vel.shape[1],
        nl=co.shape[1],
        nclass=co.shape[0],
        vel_offs=tuple(tuple(tuple(int(x) for x in o) for o in cls) for cls in vel),
        p_offs=tuple(tuple(tuple(int(x) for x in o) for o in cls) for cls in co),
    )


def _vel_view_slices(off, m):
    """Strided fine-lattice slices selecting site 2t+off over cells t."""
    return tuple(slice(o, o + 2 * m - 1, 2) for o in off)


def _p_view_slices(off, m):
    return tuple(slice(o, o + m) for o in off)


def _gather_local(wiring: NSJacWiring, c: int, m: int, xv, xp):
    """(nloc, *cells, P) local dof array for class c from lattice fields.

    xv (d, *lat_fine, P); xp (1, *lat_coarse, P)."""
    rows = []
    for comp in range(wiring.dim):
        for b in range(wiring.nbv):
            sl = (comp,) + _vel_view_slices(wiring.vel_offs[c][b], m)
            rows.append(xv[sl])
        # component-major: all nbv nodes of comp before the next comp
    for i in range(wiring.nl):
        sl = (0,) + _p_view_slices(wiring.p_offs[c][i], m)
        rows.append(xp[sl])
    return jnp.stack(rows, axis=0)


def _scatter_local(wiring: NSJacWiring, c: int, m: int, y_loc, yv, yp):
    """Accumulate (nloc, *cells, P) class contributions into lattice fields."""
    k = 0
    for comp in range(wiring.dim):
        for b in range(wiring.nbv):
            sl = (comp,) + _vel_view_slices(wiring.vel_offs[c][b], m)
            yv = yv.at[sl].add(y_loc[k])
            k += 1
    for i in range(wiring.nl):
        sl = (0,) + _p_view_slices(wiring.p_offs[c][i], m)
        yp = yp.at[sl].add(y_loc[k])
        k += 1
    return yv, yp


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

JAC_CELL_CHUNK = 4096  # cells per jacfwd batch: bounds (nq,nbv,d,B) temps


def assemble_ns_jacobian(
    space,
    ps,
    wiring: NSJacWiring,
    coords_p,
    v0_p,
    p0_p,
    visc,
    stab: float = 0.0,
):
    """Per-class local Jacobian blocks at the frozen state (s0 = (v0, p0)).

    coords_p (d, *lat_coarse, P): level-k lattice vertex coordinates;
    v0_p (d, *lat_fine, P): P2 velocity as a fine-lattice field;
    p0_p (1, *lat_coarse, P): pressure.  Returns W: (nclass, nloc, nloc,
    *cells, P) - exact per-element Jacobians of the Galerkin residual
    (Dirichlet handling lives in the apply, matching ns_residual's row
    replacement semantics)."""
    d = wiring.dim
    m = ps.levels[-1].m
    nloc = wiring.nloc
    nbv, nl = wiring.nbv, wiring.nl

    def f_single(u, x):
        """Local residual of ONE element: u (nloc,), x (d, nl)."""
        ve = u[: d * nbv].reshape(d, nbv)
        pe = u[d * nbv :]
        r_mom, r_div = nsops.ns_elem_residual(
            space, x[..., None], ve[..., None], pe[..., None], visc, stab
        )
        return jnp.concatenate([r_mom.reshape(-1), r_div.reshape(-1)])

    jac_single = jax.jacfwd(f_single, argnums=0)  # (nloc, nloc)

    Ws = []
    for c in range(wiring.nclass):
        # corner coords of class c: (d, nl, *cells, P)
        x_c = jnp.stack(
            [coords_p[(slice(None),) + _p_view_slices(wiring.p_offs[c][i], m)]
             for i in range(nl)],
            axis=1,
        )
        u0_c = _gather_local(wiring, c, m, v0_p, p0_p)  # (nloc, *cells, P)
        cells_shape = u0_c.shape[1:]
        B = int(np.prod(cells_shape))
        u0f = u0_c.reshape(nloc, B)
        xf = x_c.reshape(d, nl, B)

        nb = max(1, -(-B // JAC_CELL_CHUNK))
        block = -(-B // nb)
        pad = nb * block - B
        u0f = jnp.pad(u0f, ((0, 0), (0, pad)))
        # pad with element-0 geometry (degenerate zero-coords would make
        # Jinv infinite and poison jacfwd with NaN * 0)
        xf = jnp.concatenate(
            [xf, jnp.broadcast_to(xf[:, :, :1], (d, nl, pad))], axis=2
        )

        jac_batch = jax.vmap(jac_single, in_axes=(-1, -1), out_axes=-1)

        def body(args):
            ub, xb = args  # (nloc, block), (d, nl, block)
            return jac_batch(ub, xb)

        shp = lambda a: jnp.moveaxis(
            a.reshape(a.shape[:-1] + (nb, block)), -2, 0
        )
        Wb = jax.lax.map(body, (shp(u0f), shp(xf)))  # (nb, nloc, nloc, block)
        Wc = jnp.moveaxis(Wb, 0, -2).reshape(nloc, nloc, nb * block)[:, :, :B]
        Ws.append(Wc.reshape((nloc, nloc) + cells_shape))
    return jnp.stack(Ws, axis=0)


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _apply_galerkin(wiring: NSJacWiring, m: int, W, xv, xp, transpose: bool):
    yv = jnp.zeros_like(xv)
    yp = jnp.zeros_like(xp)
    eq = "ba...,b...->a..." if transpose else "ab...,b...->a..."
    for c in range(wiring.nclass):
        x_loc = _gather_local(wiring, c, m, xv, xp)
        y_loc = jnp.einsum(eq, W[c], x_loc)
        yv, yp = _scatter_local(wiring, c, m, y_loc, yv, yp)
    return yv, yp


def apply_ns_jacobian(
    ps,
    pre_ps,
    wiring: NSJacWiring,
    tab_f,
    tab_c,
    W,
    xv,
    xp,
    spmd=None,
):
    """y = J x on lattice fields.  xv (d, *lat_fine, P) consistent velocity,
    xp (1, *lat_coarse, P) consistent pressure.  tab_f/tab_c: LevelTables of
    the fine (NS-Dirichlet) and coarse patch levels.  Returns (yv, yp)
    consistent.  Dirichlet velocity rows are identity (matching
    ns_residual's ``v - g`` rows)."""
    m = ps.levels[-1].m
    yv, yp = _apply_galerkin(wiring, m, W, xv, xp, transpose=False)
    yv = pst.exchange_sum(pre_ps.fine, yv, tab=tab_f, spmd=spmd)
    yp = pst.exchange_sum(ps.fine, yp, tab=tab_c, spmd=spmd)
    free = tab_f.free[None].astype(xv.dtype)
    yv = free * yv + (1.0 - free) * xv
    return yv, yp


def apply_ns_jacobian_t(
    ps,
    pre_ps,
    wiring: NSJacWiring,
    tab_f,
    tab_c,
    W,
    xv,
    xp,
    spmd=None,
):
    """y = J^T x.  With J = F + (I-F) J_g (F = Dirichlet row selector),
    J^T = F + J_g^T (I-F): zero the fixed entries of x, apply the
    transposed Galerkin blocks, then ADD x back on the fixed entries
    (exactly what jax.vjp of ns_residual produces)."""
    m = ps.levels[-1].m
    free = tab_f.free[None].astype(xv.dtype)
    xv_t = free * xv
    yv, yp = _apply_galerkin(wiring, m, W, xv_t, xp, transpose=True)
    yv = pst.exchange_sum(pre_ps.fine, yv, tab=tab_f, spmd=spmd)
    yp = pst.exchange_sum(ps.fine, yp, tab=tab_c, spmd=spmd)
    yv = yv + (1.0 - free) * xv
    return yv, yp


def make_bt_fn(space, ps, pre_ps, wiring: NSJacWiring, tab_f):
    """(zp (n_p,), W) -> B^T zp (d, n_vel): the pressure-gradient coupling
    into the momentum rows, from the stored velocity-pressure sub-blocks
    (W[:, :d*nbv, d*nbv:]).  Replaces the residual-evaluation trick in
    solvers.ns_solver._bt_coupling inside the block preconditioner - one
    ~10%-of-a-Jacobian-apply einsum instead of a full quadrature element
    loop per preconditioner application.  Fixed (Dirichlet) momentum rows
    are zero, exactly as the residual-difference form gives."""
    d, nbv, nl = wiring.dim, wiring.nbv, wiring.nl
    m = ps.levels[-1].m

    def bt(zp, W):
        xp = pst.to_patch(ps.fine, zp[None])
        # velocity-field shape from the fine-level tables
        yv = jnp.zeros((d,) + tab_f.free.shape, xp.dtype)
        for c in range(wiring.nclass):
            p_loc = jnp.stack(
                [xp[(0,) + _p_view_slices(wiring.p_offs[c][i], m)]
                 for i in range(nl)],
                axis=0,
            )  # (nl, *cells, P)
            Wvp = W[c, : d * nbv, d * nbv :]  # (d*nbv, nl, *cells, P)
            y_loc = jnp.einsum("ab...,b...->a...", Wvp, p_loc)
            k = 0
            for comp in range(d):
                for b in range(nbv):
                    sl = (comp,) + _vel_view_slices(wiring.vel_offs[c][b], m)
                    yv = yv.at[sl].add(y_loc[k])
                    k += 1
        yv = pst.exchange_sum(pre_ps.fine, yv, tab=tab_f)
        yv = yv * tab_f.free[None].astype(yv.dtype)
        return pst.from_patch(pre_ps.fine, yv, space.n_vel, mode="owner")

    return bt


# ---------------------------------------------------------------------------
# global packed-state wrappers (drop-in Jv for solvers.ns_solver)
# ---------------------------------------------------------------------------


def jac_memory_bytes(ps, wiring: NSJacWiring, itemsize: int = 4) -> int:
    m = ps.levels[-1].m
    cells = m ** wiring.dim * ps.P
    return wiring.nclass * wiring.nloc**2 * cells * itemsize


def make_assemble_fn(space, ps, pre_ps, wiring: NSJacWiring, stab: float = 0.0):
    """(coords (V,d), s, visc) -> W, via the lattice representation."""

    def assemble(coords, s, visc):
        v0, p0 = space.unpack(s)
        coords_p = pst.to_patch(ps.fine, coords.T)
        v0_p = pst.to_patch(pre_ps.fine, v0)
        p0_p = pst.to_patch(ps.fine, p0[None])
        return assemble_ns_jacobian(
            space, ps, wiring, coords_p, v0_p, p0_p, visc, stab
        )

    return assemble


def make_matvec_fns(space, ps, pre_ps, wiring: NSJacWiring, tab_f, tab_c):
    """Global packed-state (n_state,) -> (n_state,) matvec closures
    (Jv, JTv), each taking (x, W)."""

    def to_lattice(x):
        xv, xp = space.unpack(x)
        return (
            pst.to_patch(pre_ps.fine, xv),
            pst.to_patch(ps.fine, xp[None]),
        )

    def from_lattice(yv_p, yp_p):
        yv = pst.from_patch(pre_ps.fine, yv_p, space.n_vel, mode="owner")
        yp = pst.from_patch(ps.fine, yp_p, space.n_pressure, mode="owner")
        return space.pack(yv, yp[0])

    def jv(x, W):
        yv, yp = apply_ns_jacobian(
            ps, pre_ps, wiring, tab_f, tab_c, W, *to_lattice(x)
        )
        return from_lattice(yv, yp)

    def jtv(x, W):
        yv, yp = apply_ns_jacobian_t(
            ps, pre_ps, wiring, tab_f, tab_c, W, *to_lattice(x)
        )
        return from_lattice(yv, yp)

    return jv, jtv
