"""Representation adapters for the ADMM solver.

optim.admm's Newton/ADMM logic is representation-agnostic; these adapters
bind it to a concrete field layout:

 * GlobalOps - fields (C, V) global vectors, tensors (d, d, E); block-ELL
   SpMV + solvers.mg V-cycle.  Works on any simplex mesh (.ugx input).
 * PatchOps  - fields (C, *lat, P) brick-patch lattices, tensors
   (d, d, T, *cells, P); gather-free stencil apply + solvers.patch_mg
   V-cycle with owner-weighted inner products.  ~6x faster on TPU; needs
   brick metadata (geomgen meshes).

Both present the same methods, so trajectories agree to roundoff (tested).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops import deformation as dfm
from ..ops import patchdeform as pdfm
from ..ops import patchstencil as pst
from ..ops import sparsity
from ..solvers import mg as mgmod
from ..solvers import patch_mg as pmg


@dataclasses.dataclass
class GlobalOps:
    """Current-geometry operator bundle on the global representation."""

    struct: Any  # mg.MGStructure
    mgdata: Any  # mg.MGData
    coords: jnp.ndarray  # (V, d)
    elems: jnp.ndarray  # (E, nl)
    free: jnp.ndarray  # (C, V) float mask

    @property
    def dim(self):
        return self.coords.shape[1]

    def zeros_field(self, dtype):
        return jnp.zeros((self.dim, self.coords.shape[0]), dtype)

    def zeros_tensor(self, dtype):
        d = self.dim
        return jnp.zeros((d, d, self.elems.shape[0]), dtype)

    def A(self, x):
        return sparsity.spmv_cn(self.struct.patterns[-1], self.mgdata.vals[-1], x)

    def M(self, r):
        Mf = mgmod.make_preconditioner(self.struct, self.mgdata)
        return Mf(r.reshape(-1)).reshape(r.shape)

    def dot(self, x, y):
        return jnp.vdot(x, y)

    def dot_batch(self, Xs, Ys):
        """(i, ...) x (j, ...) -> (i, j) Gram block in ONE pass over memory
        (the Schur assembly needs m*(1+m) pairings; 20 separate dots re-read
        the operands 40 times)."""
        Xf = Xs.reshape(Xs.shape[0], -1)
        Yf = Ys.reshape(Ys.shape[0], -1)
        return Xf @ Yf.T

    def constraints(self, u, ref_volume, ref_barycenter):
        return dfm.constraints(self.coords, self.elems, u, ref_volume, ref_barycenter)

    def constraint_grads(self, u, ref_volume, ref_barycenter):
        return dfm.constraint_grads(
            self.coords, self.elems, u, ref_volume, ref_barycenter, self.free
        )

    def constraint_hvp(self, u, Lmbda, ref_volume, ref_barycenter, x):
        return (
            dfm.constraint_hvp(
                self.coords, self.elems, u, Lmbda, ref_volume, ref_barycenter,
                x * self.free,
            )
            * self.free
        )

    def hvp_fn(self, u, Lmbda, ref_volume, ref_barycenter):
        """x -> (sum_k Lambda_k g_k'') x at the FIXED Newton iterate.  The
        patch adapter precomputes the (u, Lambda)-dependent cell state here
        (the HVP runs at every Krylov matvec); the global form has no
        comparable separable precompute, so it just closes over."""
        return lambda x: self.constraint_hvp(
            u, Lmbda, ref_volume, ref_barycenter, x
        )

    def hess_fn(self, u, Lmbda, ref_volume, ref_barycenter):
        """x -> (A + sum_k Lambda_k g_k'') x with the constraint Hessian
        ASSEMBLED into the ELL values once per Newton iterate
        (dfm.hvp_elem_mats): every Krylov matvec becomes one SpMV instead
        of SpMV + a forward-over-reverse AD sweep of the constraint
        functionals."""
        pat = self.struct.patterns[-1]
        em = dfm.hvp_elem_mats(self.coords, self.elems, u * self.free, Lmbda)
        vals_h = sparsity.assemble_values(pat, em)
        # zero Dirichlet rows/cols WITHOUT the unit diagonal (A's baked
        # values already carry it; adding another would double it)
        fixed = self.free == 0  # (C, V) bool
        cols = jnp.asarray(pat.cols)
        row_fix = fixed[:, None, None, :]
        col_fix = fixed[:, cols][None]
        vals_h = jnp.where(row_fix | col_fix, 0.0, vals_h)
        vals_H = self.mgdata.vals[-1] + vals_h

        def apply(x):
            return sparsity.spmv_cn(pat, vals_H, x)

        return apply

    def tensor_rhs(self, M):
        return dfm.tensor_rhs(self.coords, self.elems, M) * self.free

    def grad_tensor(self, u):
        return dfm.elem_grads_of(self.coords, self.elems, u)[0]

    def z_update(self, u, lam, tau, sigma, norm_name):
        return dfm.z_update(self.coords, self.elems, u, lam, tau, sigma, norm_name)

    def dual_update(self, u, lam, q_proj, tau):
        return dfm.dual_update(self.coords, self.elems, u, lam, q_proj, tau)

    def max_grad_norm(self, u, norm_name):
        if norm_name == "spectral":
            return dfm.max_spectral_norm(self.coords, self.elems, u)
        return dfm.max_frobenius_norm(self.coords, self.elems, u)

    def norm_p1(self, f):
        from .admm import l2_norm_p1

        return l2_norm_p1(self.coords, self.elems, f)

    def norm_pc(self, T):
        from .admm import l2_norm_pc

        return l2_norm_pc(self.coords, self.elems, T)


@dataclasses.dataclass
class PatchOps:
    """Operator bundle on the brick-patch representation (TPU fast path).

    With struct.spmd set (and pvalid = the local patch-validity slice on a
    padded set) the SAME adapter runs inside shard_map with the patch axis
    sharded: exchanges become halo all-gathers, reductions psum, max-norms
    pmax - so optim.admm's Newton/ADMM loops run spatially SPMD unchanged
    (parallel.patch_shard builds this wiring)."""

    struct: Any  # pmg.PatchMGStructure (carries spmd ctx if sharded)
    data: Any  # pmg.PatchMGData (carries per-level tables)
    coords_p: jnp.ndarray  # (d, *lat, P[_local])
    pvalid: jnp.ndarray | None = None  # (P_local,) 0 at padded dummy patches

    @property
    def ps(self):
        return self.struct.ps

    @property
    def spmd(self):
        return self.struct.spmd

    @property
    def dim(self):
        return self.ps.dim

    @property
    def tab(self):
        return self.data.tabs[self.ps.k]

    @property
    def free(self):
        return self.tab.free.astype(self.coords_p.dtype)  # (*lat, P); bcasts

    def _psum(self, v):
        return v if self.spmd is None else jax.lax.psum(v, self.spmd.axis)

    def _pmax(self, v):
        return v if self.spmd is None else jax.lax.pmax(v, self.spmd.axis)

    @property
    def _P_local(self):
        return self.coords_p.shape[-1]

    def zeros_field(self, dtype):
        lvl = self.ps.fine
        return jnp.zeros((self.dim,) + lvl.lat_shape + (self._P_local,), dtype)

    def zeros_tensor(self, dtype):
        d = self.dim
        T = len(self.ps.class_offsets)
        m = self.ps.fine.m
        return jnp.zeros((d, d, T) + (m,) * d + (self._P_local,), dtype)

    def A(self, x):
        y = pst.exchange_sum(
            None, pst.apply_w(self.ps, self.data.W[self.ps.k], x), self.tab,
            spmd=self.spmd,
        )
        return y * self.free

    def M(self, r):
        return pmg.vcycle_p(self.struct, self.data, r)

    def dot(self, x, y):
        return pst.owner_dot(None, x, y, self.tab, spmd=self.spmd)

    def dot_batch(self, Xs, Ys):
        """Owner-weighted (i, j) Gram block in one pass (see GlobalOps).
        owner is (lat..., P) and broadcasts over the component axis."""
        w = self.tab.owner.astype(Xs.dtype)
        Xf = (Xs * w[None]).reshape(Xs.shape[0], -1)
        Yf = Ys.reshape(Ys.shape[0], -1)
        return self._psum(Xf @ Yf.T)

    def _cons(self, x_add):
        """additive -> consistent + free mask."""
        return pst.exchange_sum(None, x_add, self.tab, spmd=self.spmd) * self.free

    def constraints(self, u, ref_volume, ref_barycenter):
        dt = self.coords_p.dtype
        g = pdfm.constraints_p(
            self.ps, self.coords_p, u,
            jnp.zeros((), dt), jnp.zeros((self.dim,), dt),
            pvalid=self.pvalid,
        )
        # references subtracted AFTER the psum (local values are partial sums)
        refs = jnp.concatenate(
            [jnp.asarray(ref_volume, dt)[None], jnp.asarray(ref_barycenter, dt)]
        )
        return self._psum(g) - refs

    def constraint_grads(self, u, ref_volume, ref_barycenter):
        # analytic cofactor form: the jacrev AD transpose carries
        # 128x-tile-padded temporaries at 3D refs>=3 (ops.patchdeform)
        B = pdfm.constraint_grads_analytic_p(
            self.ps, self.coords_p, u, ref_volume, ref_barycenter,
            pvalid=self.pvalid,
        )
        return jax.vmap(self._cons)(B)

    def constraint_hvp(self, u, Lmbda, ref_volume, ref_barycenter, x):
        h = pdfm.constraint_hvp_analytic_p(
            self.ps, self.coords_p, u, Lmbda, ref_volume, ref_barycenter,
            x * self.free, pvalid=self.pvalid,
        )
        return self._cons(h)

    def hvp_fn(self, u, Lmbda, ref_volume, ref_barycenter):
        state = pdfm.hvp_state_p(
            self.ps, self.coords_p, u, Lmbda, pvalid=self.pvalid
        )

        def apply(x):
            h = pdfm.constraint_hvp_apply_p(
                self.ps, self.coords_p, state, x * self.free
            )
            return self._cons(h)

        return apply

    def hess_fn(self, u, Lmbda, ref_volume, ref_barycenter):
        """x -> (A + sum_k Lambda_k g_k'') x with the constraint Hessian
        ASSEMBLED into the stencil once per Newton iterate
        (pdfm.hvp_corner_block_fn): every Krylov matvec is then ONE fused
        stencil apply + exchange instead of A-apply + per-cell HVP work
        (measured refs=4: 10 ms vs 45 ms per single-lane matvec - the
        matvec side is where the ADMM iteration cost lives, ROADMAP r3)."""
        ps = self.ps
        W_A = self.data.W[ps.k]
        sym = W_A.shape[0] == len(pst.half_slots(ps))
        stacked = jnp.concatenate([self.coords_p, u], axis=0)
        W_h = pst.assemble_w(
            ps, ps.k, stacked, pdfm.hvp_corner_block_fn(Lmbda),
            sym=sym, free=self.tab.free,
        )
        if self.pvalid is not None:
            # padded dummy patches replicate real geometry; their Hessian
            # contributions must vanish like the pvalid-masked volumes do
            W_h = W_h * self.pvalid
        W_H = W_A + W_h

        def apply(x):
            y = pst.exchange_sum(
                None, pst.apply_w(ps, W_H, x), self.tab, spmd=self.spmd
            )
            return y * self.free

        return apply

    def tensor_rhs(self, M):
        return self._cons(pdfm.tensor_rhs_p(self.ps, self.coords_p, M))

    def grad_tensor(self, u):
        return pdfm.cell_grads(self.ps, self.coords_p, u)[0]

    def z_update(self, u, lam, tau, sigma, norm_name):
        return pdfm.z_update_p(self.ps, self.coords_p, u, lam, tau, sigma, norm_name)

    def dual_update(self, u, lam, q_proj, tau):
        return pdfm.dual_update_p(self.ps, self.coords_p, u, lam, q_proj, tau)

    def max_grad_norm(self, u, norm_name):
        if norm_name == "spectral":
            v = pdfm.max_spectral_norm_p(self.ps, self.coords_p, u, self.pvalid)
        else:
            v = pdfm.max_frobenius_norm_p(self.ps, self.coords_p, u, self.pvalid)
        return self._pmax(v)

    def norm_p1(self, f):
        v = pdfm.l2_norm_p1_p(self.ps, self.coords_p, f, self.pvalid)
        return jnp.sqrt(self._psum(v * v))

    def norm_pc(self, T):
        v = pdfm.l2_norm_pc_p(self.ps, self.coords_p, T, self.pvalid)
        return jnp.sqrt(self._psum(v * v))
