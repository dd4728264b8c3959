"""P1 vector function space over a refinement hierarchy + its GMG wiring.

Equivalent of ``DeformationSpace_ApproxSpace`` (reference 2d_admm.lua:363-366)
plus the solver-side per-level operator management that UG4's
GeometricMultiGrid does internally.  Coarse-level coordinates are the prefix
slice of the fine coordinates (core.mesh invariant), so after every mesh
deformation all levels re-assemble from the *current* geometry in one jitted
call - the analogue of rap=true rebuilds in the reference
(obstacle_optim_util.lua:28).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..core.mesh import Hierarchy
from ..solvers.mg import MGData, MGStructure
from . import sparsity
from .deformation import deformation_elem_mats


@dataclasses.dataclass
class P1VectorSpace:
    """Static wiring of a (block-)P1 space over all hierarchy levels.

    ncomp: dofs per vertex - the mesh dimension for the vector deformation /
    velocity spaces, 1 for scalar spaces (e.g. the PCD pressure operators,
    solvers.ns_solver.ns_pcd_precond_data)."""

    hier: Hierarchy
    dirichlet: tuple[str, ...]
    patterns: tuple[sparsity.Pattern, ...]
    fixed: list  # per level (C, V) bool np
    parents: list  # per level l>=1: (V_l, 2) np
    elems: list  # per level jnp (E, d+1)
    nv: list  # vertices per level
    ncomp: int = 0  # 0 sentinel -> hier.dim (set in build)

    @classmethod
    def build(
        cls, hier: Hierarchy, dirichlet=("inlet", "wall", "outlet"), ncomp=None
    ) -> "P1VectorSpace":
        C = hier.dim if ncomp is None else ncomp
        patterns, fixed, elems, nv = [], [], [], []
        for lvl in hier.levels:
            patterns.append(sparsity.build_pattern(lvl.elems, lvl.num_vertices, C))
            m = lvl.vertex_mask(dirichlet)
            fixed.append(np.repeat(m[None, :], C, axis=0))  # (C, V)
            elems.append(jnp.asarray(lvl.elems))
            nv.append(lvl.num_vertices)
        parents = [
            jnp.asarray(hier.levels[l].parents) for l in range(1, len(hier.levels))
        ]
        return cls(
            hier, tuple(dirichlet), tuple(patterns), fixed, parents, elems, nv,
            ncomp=C,
        )

    @property
    def fine_pattern(self) -> sparsity.Pattern:
        return self.patterns[-1]

    def free_mask(self, level: int = -1) -> jnp.ndarray:
        """(C, V) float mask: 1 at free dofs, 0 at Dirichlet dofs."""
        return jnp.asarray(~self.fixed[level], dtype=jnp.zeros(0).dtype)

    def mg_structure(self, pre_smooth=3, post_smooth=3, cheb_lower=0.25) -> MGStructure:
        return MGStructure(
            patterns=self.patterns,
            n_levels=len(self.patterns),
            pre_smooth=pre_smooth,
            post_smooth=post_smooth,
            cheb_lower=cheb_lower,
        )

    def assemble_mg(
        self,
        struct: MGStructure,
        fine_coords: jnp.ndarray,
        c_eps: float,
        c_grad: float,
        c_mass: float,
    ) -> MGData:
        """Assemble the constant SPD extension operator on every level from
        the current fine-grid coordinates.

        Each level is a separately jitted (and therefore separately compile-
        cached) kernel: one monolithic whole-hierarchy graph took minutes to
        compile on TPU, the split compiles in seconds and re-runs in ms."""
        import jax

        assert self.ncomp in (0, self.hier.dim), (
            "assemble_mg builds the vector elasticity operator; scalar "
            "spaces use assemble_mg_convdiff"
        )

        from ..solvers.mg import estimate_lmax

        if not hasattr(self, "_lvl_jits"):
            self._lvl_jits = {}
        key = (c_eps, c_grad, c_mass)
        if key not in self._lvl_jits:
            fns = []
            for l, pat in enumerate(self.patterns):
                fixed_l = np.asarray(self.fixed[l])  # numpy: safe to cache
                elems_l = np.asarray(self.hier.levels[l].elems)

                def make(l=l, pat=pat, fixed_l=fixed_l, elems_l=elems_l):
                    def fn(coords_l):
                        em = deformation_elem_mats(
                            coords_l, jnp.asarray(elems_l), c_eps, c_grad, c_mass
                        )
                        vals = sparsity.assemble_values(pat, em)
                        vals = sparsity.bake_dirichlet(pat, vals, jnp.asarray(fixed_l))
                        diag = sparsity.diag_cn(pat, vals).reshape(-1)
                        lmax = estimate_lmax(pat, vals, diag)
                        free = jnp.asarray(~fixed_l, vals.dtype).reshape(-1)
                        return vals, diag, free, lmax

                    return jax.jit(fn)

                fns.append(make())
            pat0 = self.patterns[0]
            base_fn = jax.jit(
                lambda v0: jnp.linalg.inv(sparsity.to_dense(pat0, v0))
            )
            self._lvl_jits[key] = (fns, base_fn)
        fns, base_fn = self._lvl_jits[key]
        vals_l, diag_l, free_l, lmax_l = [], [], [], []
        for l in range(len(self.patterns)):
            vals, diag, free, lmax = fns[l](fine_coords[: self.nv[l]])
            vals_l.append(vals)
            diag_l.append(diag)
            free_l.append(free)
            lmax_l.append(lmax)
        base_inv = base_fn(vals_l[0])
        return MGData(vals_l, diag_l, free_l, list(self.parents), lmax_l, base_inv)

    def assemble_mg_convdiff(
        self,
        struct: MGStructure,
        fine_coords: jnp.ndarray,
        w_fine: jnp.ndarray,
        visc: float,
        with_transpose: bool = False,
    ) -> MGData:
        """Per-level convection-diffusion operators (for the NS velocity
        block): nu*grad:grad + (w.grad u, v) with the frozen advecting
        velocity w (d, V_fine) injected onto each level (prefix slicing).

        with_transpose=True additionally stores the exact in-pattern
        transposed values per level (sparsity.transpose_values), giving
        every spmv in the V-cycle a scatter-free custom transpose rule -
        this makes jax.vjp of the cycle (the adjoint solve's transposed
        preconditioner) cost the same as the forward cycle."""
        import jax

        from ..ops.convdiff import convdiff_elem_mats
        from ..solvers.mg import estimate_lmax

        if not hasattr(self, "_cd_jits"):
            self._cd_jits = {}
        if with_transpose and not hasattr(self, "_tmaps"):
            self._tmaps = [sparsity.transpose_map(p) for p in self.patterns]
        # visc enters the jitted kernels as a RUNTIME argument so a traced
        # viscosity (continuation ladder / preconditioner refresh inside a
        # jitted Newton body) reuses one compiled kernel per level
        key = ("cd", with_transpose)
        if key not in self._cd_jits:
            fns = []
            for l, pat in enumerate(self.patterns):
                fixed_l = np.asarray(self.fixed[l])  # numpy: safe to cache
                elems_l = np.asarray(self.hier.levels[l].elems)
                tmap_l = self._tmaps[l] if with_transpose else None

                def make(l=l, pat=pat, fixed_l=fixed_l, elems_l=elems_l,
                         tmap_l=tmap_l):
                    def fn(coords_l, w_l, visc):
                        em = convdiff_elem_mats(
                            coords_l, jnp.asarray(elems_l), w_l, visc,
                            ncomp=self.ncomp or None,
                        )
                        vals = sparsity.assemble_values(pat, em)
                        vals = sparsity.bake_dirichlet(pat, vals, jnp.asarray(fixed_l))
                        diag = sparsity.diag_cn(pat, vals).reshape(-1)
                        lmax = estimate_lmax(pat, vals, diag)
                        free = jnp.asarray(~fixed_l, vals.dtype).reshape(-1)
                        vals_t = (
                            sparsity.transpose_values(pat, vals, tmap_l)
                            if tmap_l is not None
                            else None
                        )
                        return vals, diag, free, lmax, vals_t

                    return jax.jit(fn)

                fns.append(make())
            pat0 = self.patterns[0]
            base_fn = jax.jit(
                lambda v0: jnp.linalg.inv(sparsity.to_dense(pat0, v0))
            )
            self._cd_jits[key] = (fns, base_fn)
        fns, base_fn = self._cd_jits[key]
        vals_l, diag_l, free_l, lmax_l, vals_t_l = [], [], [], [], []
        for l in range(len(self.patterns)):
            vals, diag, free, lmax, vals_t = fns[l](
                fine_coords[: self.nv[l]], w_fine[:, : self.nv[l]],
                jnp.asarray(visc, fine_coords.dtype),
            )
            vals_l.append(vals)
            diag_l.append(diag)
            free_l.append(free)
            lmax_l.append(lmax)
            vals_t_l.append(vals_t)
        base_inv = base_fn(vals_l[0])
        return MGData(
            vals_l, diag_l, free_l, list(self.parents), lmax_l, base_inv,
            vals_t=vals_t_l if with_transpose else None,
        )
