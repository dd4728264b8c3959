"""Steady incompressible Navier-Stokes + discrete adjoint + shape gradient.

TPU-native equivalents of the reference's plugin discretizations:

 * ``IncompressibleNavierStokes`` (2d_admm.lua:232-238): Taylor-Hood P2/P1
   (vorder=2/porder=1, 2d_admm.lua:27-28) Galerkin weak form
       nu*(grad v, grad w) + ((v.grad)v, w) - (p, div w) + (div v, psi) = 0
   with inlet profile ``max(0, cos(pi*|y_perp|/diameter))`` (2d_admm.lua:216,
   3d_admm.lua:193), no-slip on wall/obstacle, do-nothing outlet
   (bDoNothing, 2d_admm.lua:83).  A stabilized equal-order P1/P1 variant
   (Brezzi-Pitkaranta, gated by the reference's ``stab`` knob,
   2d_admm.lua:47) is also provided - it shares the vertex-based multigrid
   machinery and is the TPU-fast path.
 * ``ADMMNavierStokesAdjoint`` (2d_admm.lua:286-297): instead of a
   hand-assembled adjoint operator we solve the TRANSPOSED discrete Jacobian
   system (J^T lambda = -dJ_drag/ds) via jax.vjp - exactly consistent with
   the discretized state equation by construction.
 * ``Sensitivity`` / J' (2d_admm.lua:530-553): the discrete shape gradient
   dJ/dX = d/dX [ J_drag(v, X) + lambda^T R(v, p, X) ] by AD through the
   residual assembly w.r.t. vertex coordinates, then masked to the obstacle
   surface (``SetZeroAwayFromSubset``, 2d_admm.lua:814).
 * ``Drag`` (2d_admm.lua:768): J = 1/2 * nu * int |grad v|^2 dx on the
   current geometry.

State is a packed vector s = [v (dim, n_vel) component-major, p (V)].
Layouts follow ops.geometry: element axis LAST on all batched tensors.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import MeshLevel
from ..core.quadrature import simplex_rule
from ..core.spaces import p1_tab, p2_elem_dofs, p2_tab
from .geometry import elem_geometry, p1_phys_grads


@dataclasses.dataclass
class NSSpace:
    """Static wiring for one mesh level (host side; arrays converted lazily)."""

    dim: int
    vorder: int
    n_vertices: int
    n_vel: int  # velocity dofs per component
    elems: np.ndarray  # (E, d+1)
    edges: np.ndarray  # (Ne, 2)
    vel_dofs: np.ndarray  # (E, nbv) velocity element dofs
    vel_fixed: np.ndarray  # (n_vel,) bool - Dirichlet velocity dofs
    inlet: np.ndarray  # (n_vel,) bool - subset of fixed dofs with inflow data
    # quadrature tables
    qw: np.ndarray
    val_v: np.ndarray  # (nq, nbv)
    gref_v: np.ndarray  # (nq, nbv, d)
    val_p: np.ndarray  # (nq, d+1)
    drag_qw: np.ndarray
    drag_gref_v: np.ndarray
    diameter: float = 6.0

    @property
    def n_pressure(self) -> int:
        return self.n_vertices

    @property
    def n_state(self) -> int:
        return self.n_vel * self.dim + self.n_pressure

    @classmethod
    def build(
        cls,
        lvl: MeshLevel,
        vorder: int = 2,
        do_nothing: bool = True,
        quad_degree: int = 5,
        drag_quad_degree: int = 3,
        diameter: float = 6.0,
    ) -> "NSSpace":
        d = lvl.dim
        dir_names = ["inlet", "wall", "obstacle_surface"] + ([] if do_nothing else ["outlet"])
        vmask = lvl.vertex_mask(dir_names)
        inlet_v = lvl.subset_vertices["inlet"]
        if vorder == 2:
            vel_dofs = p2_elem_dofs(lvl)
            emask = np.zeros(len(lvl.edges), dtype=bool)
            imask_e = np.zeros(len(lvl.edges), dtype=bool)
            for name in dir_names:
                emask |= lvl.subset_edges[name]
            imask_e |= lvl.subset_edges["inlet"]
            vel_fixed = np.concatenate([vmask, emask])
            inlet = np.concatenate([inlet_v, imask_e])
            n_vel = lvl.num_vertices + len(lvl.edges)
            val_v, gref_v = p2_tab(d, quad_degree)
            _, drag_gref_v = p2_tab(d, drag_quad_degree)
        elif vorder == 1:
            vel_dofs = lvl.elems.copy()
            vel_fixed = vmask.copy()
            inlet = inlet_v.copy()
            n_vel = lvl.num_vertices
            val_v, gref_v = p1_tab(d, quad_degree)
            _, drag_gref_v = p1_tab(d, drag_quad_degree)
        else:
            raise ValueError(f"unsupported velocity order {vorder}")
        _, qw = simplex_rule(d, quad_degree)
        val_p, _ = p1_tab(d, quad_degree)
        _, drag_qw = simplex_rule(d, drag_quad_degree)
        return cls(
            dim=d,
            vorder=vorder,
            n_vertices=lvl.num_vertices,
            n_vel=n_vel,
            elems=lvl.elems,
            edges=lvl.edges,
            vel_dofs=vel_dofs,
            vel_fixed=vel_fixed,
            inlet=inlet,
            qw=qw,
            val_v=val_v,
            gref_v=gref_v,
            val_p=val_p,
            drag_qw=drag_qw,
            drag_gref_v=drag_gref_v,
            diameter=diameter,
        )

    # -- packing ---------------------------------------------------------
    def pack(self, v: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """v (dim, n_vel) component-major, p (V,) -> flat state."""
        return jnp.concatenate([v.reshape(-1), p])

    def unpack(self, s: jnp.ndarray):
        nv = self.n_vel * self.dim
        return s[:nv].reshape(self.dim, self.n_vel), s[nv:]


def vel_dof_coords(space: NSSpace, coords: jnp.ndarray) -> jnp.ndarray:
    """(d, n_vel) positions of velocity dofs on the CURRENT geometry."""
    if space.vorder == 1:
        return coords.T
    mid = coords[jnp.asarray(space.edges)].mean(axis=1)
    return jnp.concatenate([coords, mid], axis=0).T


def inlet_values(space: NSSpace, coords: jnp.ndarray) -> jnp.ndarray:
    """(n_vel, d) Dirichlet data: cos-profile inflow in x, zero elsewhere.

    Parity: InletVelocities (2d_admm.lua:216-220, 3d_admm.lua:193-197)."""
    xc = vel_dof_coords(space, coords)  # (d, n_vel)
    r2 = jnp.sum(xc[1:, :] ** 2, axis=0)
    # safe sqrt: grad(sqrt) is NaN at 0 (centerline dofs); the double-where
    # pattern keeps AD through vertex coordinates finite
    r = jnp.where(r2 > 0, jnp.sqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
    prof = jnp.maximum(0.0, jnp.cos(r * jnp.pi / space.diameter))
    g = jnp.zeros((space.dim, space.n_vel), dtype=coords.dtype)
    g = g.at[0, :].set(jnp.where(jnp.asarray(space.inlet), prof, 0.0))
    return g


NS_ELEM_CHUNK = 16384  # element block size: bounds quadrature temporaries


def _elem_chunks(E: int):
    """(n_blocks, block, pad) so quadrature temporaries stay O(block).

    The Newton/GMRES program otherwise keeps ~dozens of (nq, nbv, d, E)
    buffers live (measured 7 GB of XLA temps at 3D refs=2 = OOM on one
    v5e); lax.map over element blocks caps them at the block size."""
    if E <= NS_ELEM_CHUNK:
        return 1, E, 0
    nb = -(-E // NS_ELEM_CHUNK)
    block = -(-E // nb)
    return nb, block, nb * block - E


def ns_elem_residual(
    space: NSSpace,
    x: jnp.ndarray,
    ve: jnp.ndarray,
    pe: jnp.ndarray,
    visc: float,
    stab: float = 0.0,
    msk: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Element-local Galerkin residual from explicit corner positions.

    x (d, nl, B): element corner coordinates; ve (d, nbv, B): local velocity
    dofs; pe (nl, B): local pressure dofs; msk (B,): 0/1 padding mask.
    Returns (r_mom_e (d, nbv, B), r_div_e (nl, B)) - the per-element
    contributions BEFORE scatter and Dirichlet row replacement.  This is the
    single source of truth for the NS weak form: ``ns_residual`` gathers /
    scatters around it, and the lattice Jacobian assembly
    (ops.ns_patchjac) differentiates it per element class."""
    d = space.dim
    dtype = x.dtype
    qw = jnp.asarray(space.qw, dtype=dtype)
    val_v = jnp.asarray(space.val_v, dtype=dtype)
    gref_v = jnp.asarray(space.gref_v, dtype=dtype)
    val_p = jnp.asarray(space.val_p, dtype=dtype)
    from .geometry import corner_geometry

    _, detJ, Jinv, vol = corner_geometry(x)
    gv = jnp.einsum("qbr,rd...->qbd...", gref_v, Jinv)  # (nq, nbv, d, B)
    vq = jnp.einsum("qb,cb...->cq...", val_v, ve)
    gradv = jnp.einsum("qbd...,cb...->cdq...", gv, ve)
    pq = jnp.einsum("qa,a...->q...", val_p, pe)
    divv = jnp.einsum("ccq...->q...", gradv)
    adet = jnp.abs(detJ) if msk is None else jnp.abs(detJ) * msk
    wdet = qw.reshape((-1,) + (1,) * adet.ndim) * adet[None] / _dfact(d)
    conv = jnp.einsum("dq...,cdq...->cq...", vq, gradv)
    r_visc = visc * jnp.einsum("q...,cdq...,qbd...->cb...", wdet, gradv, gv)
    r_conv = jnp.einsum("q...,cq...,qb->cb...", wdet, conv, val_v)
    r_pres = -jnp.einsum("q...,q...,qbc...->cb...", wdet, pq, gv)
    r_mom_e = r_visc + r_conv + r_pres  # (d, nbv, B)
    r_div_e = jnp.einsum("q...,q...,qa->a...", wdet, divv, val_p)  # (nl, B)
    if stab != 0.0:
        # Brezzi-Pitkaranta: +stab * h_e^2 (grad p, grad psi) - the sign
        # that ADDS to the pressure Schur (C + D A^-1 D^T definite)
        gp1 = p1_phys_grads(Jinv)
        gradp = jnp.einsum("ad...,a...->d...", gp1, pe)
        h2 = vol ** (2.0 / d)
        vmsk = vol if msk is None else vol * msk
        r_div_e = r_div_e + stab * jnp.einsum(
            "...,d...,ad...->a...", h2 * vmsk, gradp, gp1
        )
    return r_mom_e, r_div_e


def ns_residual(
    space: NSSpace,
    coords: jnp.ndarray,
    s: jnp.ndarray,
    visc: float,
    stab: float = 0.0,
) -> jnp.ndarray:
    """Packed Galerkin residual with Dirichlet rows replaced by (v - g)."""
    d = space.dim
    v, p = space.unpack(s)  # v (d, n_vel), p (V,)
    elems = jnp.asarray(space.elems)
    vel_dofs_t = jnp.asarray(space.vel_dofs).T  # (nbv, E)

    E = elems.shape[0]
    nb, block, pad = _elem_chunks(E)
    # pad with copies of element 0 (valid geometry - zero-index padding would
    # make detJ = 0 and poison the masked contributions with inf*0 = NaN)
    elems_p = jnp.concatenate([elems, jnp.tile(elems[:1], (pad, 1))])
    vdofs_p = jnp.concatenate(
        [jnp.asarray(space.vel_dofs), jnp.tile(jnp.asarray(space.vel_dofs)[:1], (pad, 1))]
    )
    emask = jnp.pad(jnp.ones(E, coords.dtype), (0, pad))

    def body(args):
        el, vd, msk = args  # (block, nl), (block, nbv), (block,)
        from .geometry import gather_elem

        x = gather_elem(coords, el)  # (d, nl, Eb)
        ve = v[:, vd.T]  # (c, nbv, Eb)
        pe = p[el.T]  # (nl, Eb)
        return ns_elem_residual(space, x, ve, pe, visc, stab, msk=msk)

    if nb == 1:
        r_mom_e, r_div_e = body((elems_p, vdofs_p, emask))
    else:
        shp = lambda a: a.reshape((nb, block) + a.shape[1:])
        r_mom_b, r_div_b = jax.lax.map(
            body, (shp(elems_p), shp(vdofs_p), shp(emask))
        )  # (nb, c, nbv, block), (nb, nl, block)
        r_mom_e = jnp.moveaxis(r_mom_b, 0, -2).reshape(d, r_mom_b.shape[2], -1)
        r_div_e = jnp.moveaxis(r_div_b, 0, -2).reshape(r_div_b.shape[1], -1)

    vseg = jnp.pad(vel_dofs_t, ((0, 0), (0, pad))).reshape(-1)
    r_mom = jax.vmap(
        lambda row: jax.ops.segment_sum(row, vseg, num_segments=space.n_vel)
    )(r_mom_e.reshape(d, -1))  # (d, n_vel)
    r_div = jax.ops.segment_sum(
        r_div_e.reshape(-1),
        elems_p.T.reshape(-1),
        num_segments=space.n_vertices,
    )

    # Dirichlet rows: R = v - g
    g = inlet_values(space, coords)
    fixed = jnp.asarray(space.vel_fixed)[None, :]
    r_mom = jnp.where(fixed, v - g, r_mom)
    return space.pack(r_mom, r_div)


def _p1_gref(d):
    g = np.zeros((1, d + 1, d))
    g[0, 0] = -1.0
    g[0, 1:] = np.eye(d)
    return np.broadcast_to(g, (1, d + 1, d))


def _dfact(d):
    return 2.0 if d == 2 else 6.0


def drag(space: NSSpace, coords: jnp.ndarray, s: jnp.ndarray, visc: float) -> jnp.ndarray:
    """J = 1/2 * nu * int |grad v|^2 dx.  Parity: 0.5*visc*Drag(...)
    (2d_admm.lua:768, 1291)."""
    d = space.dim
    v, _ = space.unpack(s)
    elems = jnp.asarray(space.elems)
    _, detJ, Jinv, _ = elem_geometry(coords, elems)
    qw = jnp.asarray(space.drag_qw, dtype=coords.dtype)
    gref = jnp.asarray(space.drag_gref_v, dtype=coords.dtype)
    gv = jnp.einsum("qbr,rde->qbde", gref, Jinv)
    ve = v[:, jnp.asarray(space.vel_dofs).T]  # (c, nbv, E)
    gradv = jnp.einsum("qbde,cbe->cdqe", gv, ve)
    wdet = qw[:, None] * jnp.abs(detJ)[None, :] / _dfact(d)
    return 0.5 * visc * jnp.einsum("qe,cdqe,cdqe->", wdet, gradv, gradv)


# ---------------------------------------------------------------------------
# preconditioning helpers (diagonal surrogates; upgraded by solvers.ns_solver)
# ---------------------------------------------------------------------------

def diag_preconditioner(space: NSSpace, coords: jnp.ndarray, visc: float):
    """Block-diagonal preconditioner: velocity ~ diag(nu*K + M),
    pressure ~ lumped mass / nu (the standard Stokes Schur surrogate)."""
    d = space.dim
    elems = jnp.asarray(space.elems)
    vel_dofs_t = jnp.asarray(space.vel_dofs).T  # (nbv, E)
    _, detJ, Jinv, vol = elem_geometry(coords, elems)
    qw = jnp.asarray(space.qw, dtype=coords.dtype)
    val_v = jnp.asarray(space.val_v, dtype=coords.dtype)
    gref_v = jnp.asarray(space.gref_v, dtype=coords.dtype)
    gv = jnp.einsum("qbr,rde->qbde", gref_v, Jinv)
    wdet = qw[:, None] * jnp.abs(detJ)[None, :] / _dfact(d)
    kdiag_e = jnp.einsum("qe,qbde,qbde->be", wdet, gv, gv)
    mdiag_e = jnp.einsum("qe,qb,qb->be", wdet, val_v, val_v)
    kdiag = jax.ops.segment_sum(
        (visc * kdiag_e + mdiag_e).reshape(-1),
        vel_dofs_t.reshape(-1),
        num_segments=space.n_vel,
    )
    kdiag = jnp.where(jnp.asarray(space.vel_fixed), 1.0, kdiag)
    # lumped pressure mass
    pm = jax.ops.segment_sum(
        jnp.broadcast_to(vol[None, :] / (d + 1.0), elems.T.shape).reshape(-1),
        elems.T.reshape(-1),
        num_segments=space.n_vertices,
    )
    pdiag = pm / visc

    def M(r):
        rv, rp = space.unpack(r)
        return space.pack(rv / kdiag[None, :], rp / pdiag)

    return M


def pressure_mass_lumped(space: NSSpace, coords: jnp.ndarray, visc: float) -> jnp.ndarray:
    """(V,) lumped pressure mass / nu - the Stokes Schur-complement surrogate."""
    d = space.dim
    elems = jnp.asarray(space.elems)
    _, _, _, vol = elem_geometry(coords, elems)
    pm = jax.ops.segment_sum(
        jnp.broadcast_to(vol[None, :] / (d + 1.0), elems.T.shape).reshape(-1),
        elems.T.reshape(-1),
        num_segments=space.n_vertices,
    )
    return pm / visc
