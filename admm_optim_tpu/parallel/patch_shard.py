"""Vertex-partitioned halo-exchange multigrid over a device mesh.

The scaling path beyond replicated vertices (parallel.sharding): the brick-
patch lattice (core.patches) is sharded over a named mesh axis along the
patch dimension P.  Patches correspond to coarse bricks at EVERY level of
the hierarchy, so one partition serves the whole V-cycle - no level-wise
repartitioning is needed; the reference's process-hierarchy agglomeration
(2d_admm.lua:174-206) reduces here to the psum-gathered replicated dense
base solve (the gatheredBaseSolverIfAmbiguous analogue,
obstacle_optim_util.lua:21).

Communication per operator application (ops.patchstencil spmd paths):
 * halo exchange  - per lattice axis, all-gather of the two face slabs
   (O(C * lat^(d-1) * P) elements, tiny vs the O(C * lat^d * P/D) local
   work) - the ICI analogue of UG4's additive->consistent halo protocol
   (2d_admm.lua:904-961);
 * correction psum - (C, Bc) edge/corner duplicate values;
 * dot products   - scalar psum.

geomgen emits bricks x-major, so contiguous patch blocks are spatially
coherent channel slabs (the analytic block partitioning that replaces
ParMETIS, SURVEY.md section 2b).

Everything runs inside ONE jax.shard_map region per solve: the V-cycle,
CG iteration, and assembly reuse the exact single-device code in
solvers.patch_mg with struct.spmd set - tested to produce identical
iterates.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.patches import PatchSet, pad_patchset
from ..ops import patchstencil as st
from ..solvers import patch_mg as pmg


def _last_axis_spec(arr_ndim: int, axis: str) -> P:
    return P(*([None] * (arr_ndim - 1) + [axis]))


@dataclasses.dataclass
class ShardedPatchMG:
    """Sharded-P view of a patch hierarchy + MG solver entry points."""

    ps: PatchSet  # PADDED patch set (P % n_shards == 0)
    struct: pmg.PatchMGStructure  # carries spmd ctx
    mesh: Mesh
    axis: str
    P_orig: int = 0  # pre-padding patch count (pvalid boundary)
    # dtype the MG data will be assembled in: data_specs' smoother-W plan
    # must be computed with the SAME dtype assemble_patch_mg_p sees, or the
    # sharding-spec pytree can mismatch the assembled PatchMGData structure
    data_dtype: Any = jnp.float32

    @property
    def spmd(self) -> st.SpmdCtx:
        return self.struct.spmd

    @property
    def n_shards(self) -> int:
        return self.spmd.nshards

    # ---- partition specs ---------------------------------------------------

    def table_specs(self, lvl_idx: int):
        """LevelTables pytree of PartitionSpecs: owner/free/gid sharded on
        the patch axis, small neighbor/correction tables replicated.
        Agglomerated levels (< struct.replicate_below) are fully
        replicated."""
        lvl = self.ps.levels[lvl_idx]
        dim = self.ps.dim
        rep = P()
        shard = (
            rep
            if lvl_idx < self.struct.replicate_below
            else P(*([None] * dim + [self.axis]))
        )
        face_deltas = st.compute_face_deltas(lvl)
        edge_keys, edge_maps = st._corr_edge_tables(lvl)
        bsizes, faces_cover = st.df_table_info(lvl)
        # dfg_face_slot is (*slab, P): lattice dims minus the face axis
        fslab = (
            rep
            if lvl_idx < self.struct.replicate_below
            else P(*([None] * (dim - 1) + [self.axis]))
        )
        return st.LevelTables(
            owner=shard,
            free=shard,
            face_nbr=rep if lvl.use_slab else None,
            face_mask=rep if lvl.use_slab else None,
            face_sel=(
                tuple(tuple(rep for _ in sides) for sides in face_deltas)
                if face_deltas is not None
                else None
            ),
            corr_idx=(
                tuple(rep for _ in lvl.corr_idx)
                if lvl.use_slab and lvl.corr_nseg
                else None
            ),
            corr_group_oh=rep if lvl.use_slab and lvl.corr_nseg else None,
            corr_slot=(
                tuple(rep for _ in lvl.corr_slot)
                if lvl.use_slab and lvl.corr_nseg
                else None
            ),
            corr_edge_slot=(
                tuple(rep for _ in edge_maps) if edge_maps is not None else None
            ),
            bslots=None if lvl.use_slab else rep,
            bseg=None if lvl.use_slab else rep,
            gid=shard,
            dfg_bidx=tuple(rep for _ in bsizes) if bsizes else None,
            dfg_face_slot=(
                tuple(fslab for _ in range(2 * dim))
                if bsizes and faces_cover
                else None
            ),
            dfg_slot=shard if (bsizes and not faces_cover) else None,
            nseg=lvl.nseg,
            corr_nseg=lvl.corr_nseg,
            use_slab=lvl.use_slab,
            P_total=lvl.P,
            # static aux must match make_tables' (pytree equality under
            # shard_map in_specs / tree_map placement)
            halo_deltas=st.compute_halo_deltas(lvl, self.n_shards),
            face_deltas=face_deltas,
            corr_edge_keys=edge_keys,
            dfg_bsizes=bsizes,
        )

    def field_spec(self, extra_leading: int = 1) -> P:
        """(C, *lat, P) patch fields: sharded on the trailing patch axis."""
        return P(*([None] * (extra_leading + self.ps.dim) + [self.axis]))

    def data_specs(self):
        """PatchMGData pytree of PartitionSpecs."""
        dim = self.ps.dim
        RB = self.struct.replicate_below
        W = [
            P() if l < RB else P(*([None] * (3 + dim) + [self.axis]))
            for l in range(len(self.ps.levels))
        ]
        invd = [
            P() if l < RB else P(*([None] * (1 + dim) + [self.axis]))
            for l in range(len(self.ps.levels))
        ]
        lmax = [P() for _ in self.ps.levels]
        tabs = [self.table_specs(l) for l in range(len(self.ps.levels))]
        # bf16 pencil-major smoother stencils (TPU only): (n0,n1,O,C,C,n2,P)
        # sharded on the trailing patch axis like W; the spec is a pytree
        # PREFIX (one P covers the PencilW-wrapped leaf)
        plan = pmg.smoother_w_plan(self.struct, self.ps, self.data_dtype)
        W_sm = None
        if plan is not None:
            W_sm = [
                (P() if l < RB else P(*([None] * (3 + dim) + [self.axis])))
                if on
                else None
                for l, on in enumerate(plan)
            ]
        return pmg.PatchMGData(W, invd, lmax, P(), tabs, W_sm)

    # ---- placement ----------------------------------------------------------

    def make_tables(self, dtype=None):
        """Device tables placed according to table_specs."""
        dtype = self.data_dtype if dtype is None else dtype
        tabs = pmg.make_level_tables(self.ps, dtype, nshards=self.n_shards)
        out = []
        for l, tab in enumerate(tabs):
            spec = self.table_specs(l)
            out.append(
                jax.tree_util.tree_map(
                    lambda a, sp: jax.device_put(a, NamedSharding(self.mesh, sp)),
                    tab,
                    spec,
                )
            )
        return out

    def to_patch_sharded(self, v_global):
        """global (C, V) -> sharded patch layout (C, *lat, P)."""
        x = st.to_patch(self.ps.fine, jnp.asarray(v_global))
        return jax.device_put(
            x, NamedSharding(self.mesh, self.field_spec(v_global.ndim - 1))
        )

    def to_patch_sharded_raw(self, x_patch):
        """place an existing (*, *lat, P) patch array on the mesh."""
        extra = x_patch.ndim - self.ps.dim - 1
        return jax.device_put(
            jnp.asarray(x_patch), NamedSharding(self.mesh, self.field_spec(extra))
        )

    # ---- shard_map entry points ---------------------------------------------

    def assemble_fn(
        self, corner_mat_fn: Callable, base_dense_fn: Callable,
        sym: bool = False, keep_sym: bool = True,
    ):
        """jit-able (coords_p, tabs) -> PatchMGData, sharded end to end."""
        fs = self.field_spec()
        tab_specs = [self.table_specs(l) for l in range(len(self.ps.levels))]

        def asm(coords_p, tabs):
            return pmg.assemble_patch_mg_p(
                self.ps, self.struct, coords_p, corner_mat_fn, base_dense_fn,
                tabs, sym=sym, keep_sym=keep_sym,
            )

        return jax.shard_map(
            asm,
            mesh=self.mesh,
            in_specs=(fs, tab_specs),
            out_specs=self.data_specs(),
            check_vma=False,
        )

    def solve_fn(self, max_iters: int = 60, rel_tol: float = 1e-8,
                 abs_tol: float = 0.0):
        """jit-able (data, b) -> krylov result, MG-preconditioned CG."""
        fs = self.field_spec()

        def solve(data, b):
            return pmg.cg_p(
                self.struct, data, b,
                max_iters=max_iters, rel_tol=rel_tol, abs_tol=abs_tol,
            )

        from ..solvers import krylov

        res_spec = krylov.SolveResult(x=fs, iters=P(), res_norm=P(), converged=P())
        return jax.shard_map(
            solve,
            mesh=self.mesh,
            in_specs=(self.data_specs(), fs),
            out_specs=res_spec,
            check_vma=False,
        )

    def solve_ir_fn(self, rel_tol: float = 1e-8, abs_tol: float = 0.0,
                    max_rounds: int = 8, inner_rel: float = 1e-4,
                    inner_iters: int = 40):
        """jit-able (data, b) -> IRResult: sharded mixed-precision solve to
        below-f32 residuals (solvers.patch_mg.cg_ir_p) - the exchange of the
        double-float defect psums exactly (each duplicate slot's value lives
        on one shard; zero-masked psum is error-free)."""
        fs = self.field_spec()

        def solve(data, b):
            return pmg.cg_ir_p(
                self.struct, data, b, rel_tol=rel_tol, abs_tol=abs_tol,
                max_rounds=max_rounds, inner_rel=inner_rel,
                inner_iters=inner_iters,
            )

        res_spec = pmg.IRResult(
            x_hi=fs, x_lo=fs, rounds=P(), inner_iters=P(), res_norm=P(),
            converged=P(),
        )
        return jax.shard_map(
            solve,
            mesh=self.mesh,
            in_specs=(self.data_specs(), fs),
            out_specs=res_spec,
            check_vma=False,
        )

    def vcycle_fn(self):
        fs = self.field_spec()

        def vc(data, b):
            return pmg.vcycle_p(self.struct, data, b)

        return jax.shard_map(
            vc, mesh=self.mesh, in_specs=(self.data_specs(), fs),
            out_specs=fs, check_vma=False,
        )

    # ---- full ADMM step (optim.admm) over the sharded representation --------

    def tensor_spec(self) -> P:
        """(d, d, T, *cells, P) per-cell tensor fields."""
        return P(*([None] * (3 + self.ps.dim) + [self.axis]))

    def pvalid(self, P_orig: int | None = None, dtype=jnp.float32):
        """Patch-validity mask (1 on real patches, 0 on padding), sharded."""
        P_orig = self.P_orig if P_orig is None else P_orig
        v = (np.arange(self.ps.P) < P_orig).astype(np.float32)
        return jax.device_put(
            jnp.asarray(v, dtype), NamedSharding(self.mesh, P(self.axis))
        )

    def pad_field(self, x_patch):
        """Pad the trailing patch axis of an unpadded patch array with
        zeros to the sharded P, then place it on the mesh."""
        pad = self.ps.P - x_patch.shape[-1]
        if pad:
            x_patch = jnp.concatenate(
                [
                    jnp.asarray(x_patch),
                    jnp.zeros(x_patch.shape[:-1] + (pad,), x_patch.dtype),
                ],
                axis=-1,
            )
        return self.to_patch_sharded_raw(x_patch)

    def make_ops(self, data, coords_p, pvalid):
        """PatchOps adapter bound to this sharding (use inside shard_map)."""
        from ..optim.spaces import PatchOps

        return PatchOps(self.struct, data, coords_p, pvalid=pvalid)

    def admm_state_specs(self, admm_cfg):
        from ..optim import admm as admm_mod

        fs = self.field_spec()
        ts = self.tensor_spec()
        rep = P()
        return admm_mod.ADMMState(
            u=fs, u_old=fs, lam=ts, q_proj=ts, Lambda=rep, scaling=rep,
            admm_it=rep, total_newton=rep, total_lin_iters=rep,
            solver_iters=rep,
            converged=rep, failed=rep, u_diff_norm=rep, lam_inc_norm=rep,
            max_grad_norm=rep, stats=rep,
        )

    def admm_inner_fn(self, cfg):
        """jit-able sharded ADMM inner loop: the reference's 4-deep loop
        nest (2d_admm.lua:868-1253) running spatially SPMD - one shard_map
        region containing the z-prox, the constrained-Newton x-updates with
        all their MG-preconditioned Krylov solves, and the dual ascent."""
        from ..optim import admm as admm_mod

        fs = self.field_spec()

        def run(data, coords_p, pvalid, Jp, sigma, scaling, ref_vol, ref_bary):
            ops_ = self.make_ops(data, coords_p, pvalid)
            return admm_mod.admm_inner_ops(
                cfg, ops_, Jp, sigma, scaling, ref_vol, ref_bary
            )

        return jax.shard_map(
            run,
            mesh=self.mesh,
            in_specs=(
                self.data_specs(), fs, P(self.axis), fs, P(), P(), P(), P(),
            ),
            out_specs=self.admm_state_specs(cfg),
            check_vma=False,
        )

    def admm_inner_batched_fn(self, cfg, batch_axis: str = "batch"):
        """dp x spatial-SPMD: a batch of problem instances (sigma schedules /
        shape gradients - the design-sweep axis, BASELINE.md "vmap 64
        geometries") vmapped INSIDE the spatially sharded region, jitted over
        a (batch, space) mesh.  Jp (B, C, *lat, P) and sigmas (B,) are
        sharded over batch; geometry/operators are shared across the batch."""
        from ..optim import admm as admm_mod

        fs = self.field_spec()

        def run(data, coords_p, pvalid, JpB, sigmas, scaling, ref_vol, ref_bary):
            ops_ = self.make_ops(data, coords_p, pvalid)
            return jax.vmap(
                lambda Jp, sig: admm_mod.admm_inner_ops(
                    cfg, ops_, Jp, sig, scaling, ref_vol, ref_bary
                )
            )(JpB, sigmas)

        bat = lambda spec: P(batch_axis, *spec)
        return jax.shard_map(
            run,
            mesh=self.mesh,
            in_specs=(
                self.data_specs(), fs, P(self.axis), bat(fs), P(batch_axis),
                P(), P(), P(),
            ),
            out_specs=jax.tree_util.tree_map(
                bat, self.admm_state_specs(cfg),
                is_leaf=lambda x: isinstance(x, P),
            ),
            check_vma=False,
        )


def build_sharded_mg(
    ps: PatchSet,
    mesh: Mesh,
    axis: str = "space",
    pre_smooth: int = 3,
    post_smooth: int = 3,
    cheb_lower: float = 0.25,
    replicate_below: int = 0,
    data_dtype=jnp.float32,
) -> ShardedPatchMG:
    """Pad P to the axis size and wire up the spmd MG structure.

    replicate_below: levels below this index run agglomerated (replicated
    on every device; solvers.patch_mg.PatchMGStructure) - the coarse-grid
    analogue of the reference's process hierarchy (2d_admm.lua:174-206)."""
    n = int(mesh.shape[axis])
    ps_pad = pad_patchset(ps, n)
    if not 0 <= replicate_below <= ps_pad.k:
        raise ValueError(
            f"replicate_below={replicate_below} out of range [0, {ps_pad.k}]"
        )
    struct = pmg.PatchMGStructure(
        ps_pad,
        pre_smooth=pre_smooth,
        post_smooth=post_smooth,
        cheb_lower=cheb_lower,
        spmd=st.SpmdCtx(axis=axis, nshards=n),
        replicate_below=replicate_below,
    )
    return ShardedPatchMG(
        ps=ps_pad, struct=struct, mesh=mesh, axis=axis, P_orig=ps.P,
        data_dtype=data_dtype,
    )
