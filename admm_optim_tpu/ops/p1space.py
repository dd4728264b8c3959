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
from ..solvers.mg import MGData, MGStructure, build_mg_data
from . import sparsity
from .deformation import deformation_elem_mats


@dataclasses.dataclass
class P1VectorSpace:
    """Static wiring of a vector P1 space over all hierarchy levels."""

    hier: Hierarchy
    dirichlet: tuple[str, ...]
    patterns: tuple[sparsity.Pattern, ...]
    fixed: list  # per level (V, C) bool np
    parents: list  # per level l>=1: (V_l, 2) np
    elems: list  # per level jnp (E, d+1)
    nv: list  # vertices per level

    @classmethod
    def build(cls, hier: Hierarchy, dirichlet=("inlet", "wall", "outlet")) -> "P1VectorSpace":
        d = hier.dim
        patterns, fixed, elems, nv = [], [], [], []
        for lvl in hier.levels:
            patterns.append(sparsity.build_pattern(lvl.elems, lvl.num_vertices, d))
            m = lvl.vertex_mask(dirichlet)
            fixed.append(np.repeat(m[None, :], d, axis=0))  # (C, V)
            elems.append(jnp.asarray(lvl.elems))
            nv.append(lvl.num_vertices)
        parents = [np.asarray(hier.levels[l].parents) for l in range(1, len(hier.levels))]
        return cls(hier, tuple(dirichlet), tuple(patterns), fixed, parents, elems, nv)

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
        the current fine-grid coordinates."""

        def elem_mat_fn(l):
            coords_l = fine_coords[: self.nv[l]]
            return deformation_elem_mats(coords_l, self.elems[l], c_eps, c_grad, c_mass)

        fixed = [jnp.asarray(f) for f in self.fixed]
        return build_mg_data(struct, elem_mat_fn, fixed, self.parents)
