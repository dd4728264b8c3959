"""Device kernels for the brick-patch lattice backend (see core.patches).

Everything here is static-slice arithmetic on dense patch arrays
``(C, *lat, P)`` (lattice dims major, patch axis on TPU lanes) - no gathers
in any hot path.  The operator is stored as a per-site stencil

    W (C, C, O, *lat, P):   y[c, s] = sum_o sum_d W[c, d, o, s] * x[d, s+o]

with O = 7 (2D) / 15 (3D) fixed lattice offsets.  Compared to the block-ELL
SpMV (ops.sparsity) this removes the per-element gather that measures
~1 element/cycle on v5e (4.4 of 5.2 ms at 367k DoF); the stencil apply is
pure HBM-bandwidth on W.

W is stored SLOT-MAJOR, (O, C, C, *lat, P): XLA:TPU's layout assignment
puts the minor-2 array dimension on sublanes, and with the slot axis there
(the old (C, C, O, ...) layout) every per-slot W slice read only 1 of 8
sublanes per tile - measured 3-30 ms per 2.8M-DoF apply at refs=4.
Slot-major keeps per-slot slices contiguous, and the apply contracts all
slots in ONE einsum so W streams from HBM exactly once (~1.6 ms, ~380 GB/s
effective on v5e).

Duplicated-site semantics (the UG4 additive/consistent storage protocol,
2d_admm.lua:904-961): patch arrays of a global vector hold IDENTICAL values
at sites shared between bricks ("consistent"); operator application yields
per-patch partial sums ("additive"); `exchange_sum` restores consistency by
summing duplicates - a segment-sum over boundary slots only.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.patches import PatchLevel, PatchSet
from . import df


# ---------------------------------------------------------------------------
# slicing helpers
# ---------------------------------------------------------------------------

def _dst_src(o, lat_shape):
    """Static slice pairs so that dst[s] aligns with src[s] = s + o."""
    dst, src = [], []
    for oo, n in zip(o, lat_shape):
        oo = int(oo)
        dst.append(slice(max(-oo, 0), n - max(oo, 0)))
        src.append(slice(max(oo, 0), n + min(oo, 0)))
    return tuple(dst), tuple(src)


def shift_read(x, o, lat_axes_offset=0):
    """y[s] = x[s + o] with 0 outside; lattice dims start at axis
    lat_axes_offset."""
    lat_shape = x.shape[lat_axes_offset : lat_axes_offset + len(o)]
    dst, src = _dst_src(o, lat_shape)
    pre = (slice(None),) * lat_axes_offset
    y = jnp.zeros_like(x)
    return y.at[pre + dst].set(x[pre + src])


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

def half_slots(ps: PatchSet) -> list:
    """Slot indices of the symmetric half-stencil: one of each {o, -o} pair
    (center first).  For a SYMMETRIC operator W[-o] = W[o]^T (componentwise
    transpose at the shifted site), so only these slots need storing:
    8 of 15 in 3D, 4 of 7 in 2D - halving both stencil HBM footprint and
    the apply's W traffic (the hot-loop bandwidth bound)."""
    kept = []
    for oi, o in enumerate(ps.stencil):
        nj = ps.stencil_slot[tuple(int(-v) for v in o)]
        if oi <= nj:
            kept.append(oi)
    return kept


def assemble_w(
    ps: PatchSet, level: int, coords_p: jnp.ndarray, corner_mat_fn,
    p_chunk: int | None = None, sym: bool = False, free=None,
    row_chunk: int | None = None,
):
    """Assemble the stencil operator on one level.

    coords_p: (d, *lat, P) lattice coordinates for that level.
    corner_mat_fn: corners (d, nl, *cells, P) -> (C, C, nl, nl, *cells, P)
    element matrices (e.g. ops.deformation.deformation_corner_mats), OR the
    block protocol: corners -> blk with blk(a, b) = (C, C, *cells, P)
    (e.g. deformation_corner_block_fn) so each local-dof block fuses into
    the slot accumulation without the (nl*nl*C*C)-unit tensor temporary.

    Equivalent of assemble_jacobian on AssembledLinearOperator (reference
    2d_admm.lua:331,954) for translation-invariant brick lattices: per
    element class, corner positions come from static lattice slices and the
    nl x nl local couplings accumulate into stencil slots by offset
    difference.  Scatter-free: contributions are zero-PADDED from the cell
    box (m^d) to the site lattice (m+1)^d and summed per slot - XLA fuses
    padded adds; dynamic-update-slice accumulation does not fuse and
    compiles minutes-slow.

    p_chunk: run the assembly lax.map-chunked over blocks of the patch axis
    so the per-class corner-matrix temporaries stay O(chunk) - at 3D refs=5
    (m=32, P=224) the unchunked temporaries alone exceed one chip's HBM.
    Padding patches replicate patch 0 (valid geometry; zero coordinates
    would put NaNs from the singular Jacobian into the discarded block).

    sym: store only the symmetric half-stencil (half_slots order).  Valid
    iff the element matrices satisfy A[:, :, a, b] = A[:, :, b, a]^T (any
    Galerkin discretization of a symmetric bilinear form, e.g. the
    deformation operator); the skipped slots are recovered in the apply as
    shifted transposes.

    free: optional (*lat, P) Dirichlet mask; when given, row/col masking is
    folded into the per-block accumulation (equivalent to a subsequent
    bake_dirichlet_w, since site masks distribute over the element-sum)
    so no second W-sized buffer goes live.

    row_chunk: lax.map-chunk the assembly over blocks of the FIRST lattice
    axis (must divide the cell count).  Unlike p_chunk this carries no
    lane-padding penalty (lattice axes sit on sublanes), so it is the
    scaling lever for the block-protocol path: the per-chunk fusion
    liveness (~1.7 KB/cell measured at 3D refs=5) drops by m/row_chunk.
    Consecutive chunks share one site-row, stitched by static-slice adds."""
    if p_chunk is not None and p_chunk < coords_p.shape[-1]:
        P = coords_p.shape[-1]
        nb = -(-P // p_chunk)
        p_chunk = -(-P // nb)  # even blocks, minimal padding
        pad = nb * p_chunk - P

        def pad_p(x):
            return (
                jnp.concatenate([x, x[..., :1].repeat(pad, -1)], -1) if pad else x
            )

        def chunk_p(x):
            return jnp.moveaxis(
                x.reshape(x.shape[:-1] + (nb, p_chunk)), -2, 0
            )

        cp = chunk_p(pad_p(coords_p))  # (nb, d, *lat, Pc)
        if free is not None:
            # padding patches replicate patch 0's geometry but must stay
            # OUT of the operator: mask them fully fixed
            fp = jnp.concatenate(
                [free, jnp.zeros(free.shape[:-1] + (pad,), free.dtype)], -1
            ) if pad else free
            fc = chunk_p(fp)  # (nb, *lat, Pc)
            Wb = jax.lax.map(
                lambda cf: assemble_w(
                    ps, level, cf[0], corner_mat_fn, sym=sym, free=cf[1]
                ),
                (cp, fc),
            )
        else:
            Wb = jax.lax.map(
                lambda c: assemble_w(ps, level, c, corner_mat_fn, sym=sym), cp
            )  # (nb, O, C, C, *lat, Pc)
        W = jnp.moveaxis(Wb, 0, -2).reshape(Wb.shape[1:-1] + (nb * p_chunk,))
        return W[..., :P]
    dim = ps.dim
    # per-axis cell counts from the array shape (not lvl.m): the row-chunked
    # recursion below calls back with first-axis slabs
    mc = tuple(n - 1 for n in coords_p.shape[1 : 1 + dim])
    if row_chunk is not None and row_chunk < mc[0]:
        m0 = mc[0]
        assert m0 % row_chunk == 0, (m0, row_chunk)
        nb = m0 // row_chunk
        rc = row_chunk
        cb = jnp.stack([coords_p[:, i * rc : i * rc + rc + 1] for i in range(nb)])
        if free is not None:
            fb = jnp.stack([free[i * rc : i * rc + rc + 1] for i in range(nb)])
            Wb = jax.lax.map(
                lambda cf: assemble_w(
                    ps, level, cf[0], corner_mat_fn, sym=sym, free=cf[1]
                ),
                (cb, fb),
            )
        else:
            Wb = jax.lax.map(
                lambda c: assemble_w(ps, level, c, corner_mat_fn, sym=sym), cb
            )  # (nb, O|H, C, C, rc+1, *rest, P)
        # stitch: consecutive chunks share one site-row; static-slice adds
        W = jnp.zeros(Wb.shape[1:4] + (m0 + 1,) + Wb.shape[5:], Wb.dtype)
        for i in range(nb):
            W = W.at[:, :, :, i * rc : i * rc + rc + 1].add(Wb[i])
        return W
    if sym:
        kpos = {s: i for i, s in enumerate(half_slots(ps))}
    else:
        kpos = {i: i for i in range(len(ps.stencil))}
    slot_terms = [[] for _ in range(len(kpos))]
    for co in ps.class_offsets:  # (nl, dim)
        corners = jnp.stack(
            [
                coords_p[
                    (slice(None),)
                    + tuple(slice(int(o), int(o) + mm) for o, mm in zip(cv, mc))
                ]
                for cv in co
            ],
            axis=1,
        )  # (d, nl, *m^dim, P)
        A = corner_mat_fn(corners)  # (C, C, nl, nl, *m^dim, P) or blk(a, b)
        blk = A if callable(A) else (lambda a, b: A[:, :, a, b])
        if free is not None:
            fcell = [
                free[tuple(slice(int(o), int(o) + mm) for o, mm in zip(cv, mc))]
                for cv in co
            ]  # per corner: free mask at cell site + offset, (*m^dim, P)
        for a in range(dim + 1):
            pad = (
                [(0, 0), (0, 0)]
                + [(int(o), 1 - int(o)) for o in co[a]]
                + [(0, 0)]
            )
            for b in range(dim + 1):
                slot = ps.stencil_slot[tuple(int(x) for x in (co[b] - co[a]))]
                pos = kpos.get(slot)
                if pos is not None:
                    t = blk(a, b)
                    if free is not None:
                        t = t * (fcell[a] * fcell[b])[None, None]
                    slot_terms[pos].append(jnp.pad(t, pad))
    W = jnp.stack([sum(terms[1:], terms[0]) for terms in slot_terms], axis=0)
    return W  # (O or H, C, C, *lat, P) slot-major


def expand_sym_w(ps: PatchSet, W):
    """Symmetric half-stencil W (H, C, C, *lat, P) -> full slot-major
    (O, C, C, *lat, P).  For a missing slot o (pair of kept slot nj = -o):
    A[s, s+o] = A[s+o, s]^T = W[nj][:, :, s+o]^T, i.e. a transposed
    shift_read (zero beyond the lattice edge - where slot o genuinely has
    no cell).  Patch-local, so valid unchanged inside shard_map.

    Memory-efficient assembly composes with the fast TPU apply as
    assemble_w(sym=True) -> expand_sym_w: the sym assembly's temporaries
    stay halved while the stored operator regains the layout the Pallas
    kernel (ops.pallas_stencil) and the one-pass XLA apply want."""
    kept = half_slots(ps)
    if W.shape[0] == len(ps.stencil):
        return W
    pos = {k: i for i, k in enumerate(kept)}
    slots = []
    for oi, o in enumerate(ps.stencil):
        nj = ps.stencil_slot[tuple(int(-v) for v in o)]
        if oi in pos:
            slots.append(W[pos[oi]])
        else:
            t = jnp.swapaxes(W[pos[nj]], 0, 1)  # transpose (c, d)
            slots.append(shift_read(t, o, lat_axes_offset=2))
    return jnp.stack(slots, axis=0)


def bake_dirichlet_w(ps: PatchSet, level: int, W, free=None):
    """Zero Dirichlet rows and columns of W (free subspace solves; fixed
    dofs carry x=0 and are masked out of all vectors).  Mirrors
    DirichletBoundary + adjust_solution (2d_admm.lua:240-258)."""
    lvl = ps.levels[level]
    free = jnp.asarray(lvl.free, W.dtype) if free is None else free  # (*lat, P)
    offs = (
        ps.stencil
        if W.shape[0] == len(ps.stencil)
        else [ps.stencil[i] for i in half_slots(ps)]
    )
    W = W * free[None, None, None]  # rows
    cols = jnp.stack(
        [shift_read(free, o) for o in offs], axis=0
    )  # (O, *lat, P): free at s+o
    return W * cols[:, None, None]


def stencil_diag(ps: PatchSet, level: int, W):
    """Additive per-copy diagonal (C, *lat, P): W[0, c, c]."""
    C = W.shape[1]
    return W[0][jnp.arange(C), jnp.arange(C)]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PencilW:
    """Explicit layout tag for pencil-major stencil storage
    (n0, n1, O, C, C, n2, P; pallas_stencil.to_pencil_major).  apply_w
    dispatches on THIS TYPE, not on axis-size sniffing - a slot-major W
    whose axis sizes happen to line up can never misdispatch (a looser
    shape test once did, breaking jax.vjp through the NS transpose_M)."""

    a: jnp.ndarray

    def tree_flatten(self):
        return ((self.a,), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def dtype(self):
        return self.a.dtype


import functools as _ft


@_ft.lru_cache(maxsize=None)
def _pencil_apply_fn(stencil):
    """custom_vmap-wrapped pencil apply for one stencil signature: the
    unbatched call runs the plain kernel; a vmap over x runs the batched
    kernel (W streamed once across lanes; pallas_stencil._kernel_pc_b)."""
    from . import pallas_stencil

    @jax.custom_batching.custom_vmap
    def f(W_pc, x):
        interp = jax.default_backend() != "tpu"
        return pallas_stencil._apply_w_pallas_3d_pc(
            stencil, W_pc, x, interpret=interp
        )

    @f.def_vmap
    def _rule(axis_size, in_batched, W_pc, x):
        w_b, x_b = in_batched
        interp = jax.default_backend() != "tpu"
        if w_b or not x_b:
            # batched W (not produced anywhere) -> per-lane fallback
            xb = x if x_b else jnp.broadcast_to(x, (axis_size,) + x.shape)
            Wb = W_pc if w_b else jnp.broadcast_to(
                W_pc, (axis_size,) + W_pc.shape
            )
            y = jax.lax.map(
                lambda args: pallas_stencil._apply_w_pallas_3d_pc(
                    stencil, args[0], args[1], interpret=interp
                ),
                (Wb, xb),
            )
            return y, True
        y = pallas_stencil._apply_w_pallas_3d_pc_batched(
            stencil, W_pc, x, interpret=interp
        )
        return y, True

    return f


def apply_w(ps: PatchSet, W, x):
    """Additive operator application: x consistent (C, *lat, P) ->
    y additive (C, *lat, P); W slot-major (O, C, C, *lat, P), or a
    PencilW-tagged pencil-major array (the bf16 smoother stream).

    One zero-pad of x turns every stencil offset into a FULL-shape slice;
    the O windows are stacked and ALL slots contract in one broadcast
    multiply + reduction over (slot, component), so W (the dominant HBM
    traffic by 30-50x) streams exactly once on the VPU.  Deliberately NOT
    an einsum/dot_general: XLA lowers the (o,d)-contraction to per-site
    3x45 MXU matmuls, which at 'highest' f32 precision ran 7.4x slower
    (29.7 vs 4.0 ms at refs=4 on v5e); the per-slot-einsum form was worse
    still when layout assignment put the slot axis on sublanes.

    Symmetric half-stencil W (assemble_w(sym=True), detected by slot
    count): the missing slots are applied as shifted transposes,
    y += shift_{-o}(W[o]^T x), so W streams ~half the bytes.

    On TPU with a 3D slot-major W (full OR symmetric-half) and a
    big-enough lattice, dispatches to the Pallas pencil kernel
    (ops.pallas_stencil): the XLA forms re-materialize full-lattice
    intermediates (measured 252 GB/s effective at refs=5); the kernel
    streams each slot block once."""
    from . import pallas_stencil

    if isinstance(W, PencilW):
        # pencil-major (n0, n1, O, C, C, n2, P) layout, tagged explicitly
        # at build time (patch_mg.assemble wraps to_pencil_major output).
        # custom_vmap: under jax.vmap (the x-update's (1+m) simultaneous
        # solves) dispatch to the BATCHED pencil kernel, which streams the
        # W block once per pencil for all lanes instead of once per lane.
        # No AD rule on this path - the smoother stream is never
        # differentiated (the NS preconditioner that IS vjp-transposed
        # uses smoother_w="f32"); direct AD users call
        # pallas_stencil.apply_w_pc, which carries the custom vjp.
        stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
        return _pencil_apply_fn(stencil)(W.a, x)
    if pallas_stencil.usable(ps, W, x):
        return pallas_stencil.apply_w_pallas(ps, W, x)
    if W.shape[0] != len(ps.stencil):
        return _apply_w_sym(ps, W, x)
    dim = ps.dim
    lat = x.shape[1 : 1 + dim]
    C = x.shape[0]
    O = len(ps.stencil)
    pad = [(0, 0)] + [(1, 1)] * dim + [(0, 0)]
    xp = jnp.pad(x, pad)
    ws = []
    for oi in range(O):
        o = ps.stencil[oi]
        sl = (
            (slice(None),)
            + tuple(slice(1 + int(oo), 1 + int(oo) + n) for oo, n in zip(o, lat))
            + (slice(None),)
        )
        ws.append(xp[sl])
    xw = jnp.stack(ws, axis=0).reshape(O, C, -1)  # (O, D, S)
    Wf = W.reshape(O, C, C, -1)  # (O, C, D, S)
    y = jnp.sum(Wf * xw[:, None], axis=(0, 2))  # (C, S)
    return y.reshape(x.shape)


def _apply_w_sym(ps: PatchSet, W, x):
    """apply_w for symmetric half-stencil storage W (H, C, C, *lat, P).

    Direct halves contract as in apply_w; each missing slot -o contributes
    y[s] += W[o][:, :, s-o]^T x[s-o], computed as a per-slot transpose
    contraction z = sum_c W[o][c, :] x[c] followed by a static-slice shift
    (zero outside - cross-patch couplings ride the duplicated boundary
    sites + exchange_sum exactly as in the full-stencil form)."""
    dim = ps.dim
    lat = x.shape[1 : 1 + dim]
    C = x.shape[0]
    kept = half_slots(ps)
    H = len(kept)
    pad = [(0, 0)] + [(1, 1)] * dim + [(0, 0)]
    xp = jnp.pad(x, pad)
    ws = []
    for h in range(H):
        o = ps.stencil[kept[h]]
        sl = (
            (slice(None),)
            + tuple(slice(1 + int(oo), 1 + int(oo) + n) for oo, n in zip(o, lat))
            + (slice(None),)
        )
        ws.append(xp[sl])
    xw = jnp.stack(ws, axis=0).reshape(H, C, -1)  # (H, D, S)
    Wf = W.reshape(H, C, C, -1)  # (H, C, D, S)
    y = jnp.sum(Wf * xw[:, None], axis=(0, 2)).reshape(x.shape)  # direct
    for h in range(1, H):
        o = ps.stencil[kept[h]]
        z = jnp.sum(W[h] * x[:, None], axis=0)  # (C, *lat, P): W^T x
        y = y + shift_read(z, [-int(v) for v in o], lat_axes_offset=1)
    return y


# measured per-site DF-apply temp footprint (AOT memory_analysis, 3D refs=5):
# the barriered EFT chain materializes ~1.8 KB/site that XLA's buffer reuse
# does not reclaim within one fused region.  Chunk the first lattice axis to
# keep the live set under ~2.5 GB.
_DF_TEMP_BYTES_PER_SITE = 1800
_DF_TEMP_BUDGET = int(2.5 * 2**30)


def _df_row_chunk(xh, dim):
    """Rows per chunk for the DF apply, or None for unchunked."""
    sites = xh[0].size
    if sites * _DF_TEMP_BYTES_PER_SITE <= _DF_TEMP_BUDGET:
        return None
    n0 = xh.shape[1]
    row_sites = sites // n0
    rc = max(1, _DF_TEMP_BUDGET // (_DF_TEMP_BYTES_PER_SITE * row_sites) - 2)
    return rc if rc < n0 else None


def _apply_w_df_rows(ps, W, xh, xl, rc, inner):
    """Row-chunked DF apply: outputs of first-lattice-axis row blocks are
    disjoint; each block's stencil reads overlap one row either side, so we
    zero-pad axis0 once and run ``inner`` on [r0-1, r1+1) extended slabs,
    keeping the interior rows.  The explicit zero rows reproduce exactly the
    jnp.pad zero-fill of the unchunked apply, so results are bitwise equal.
    Chunks are barrier-chained so XLA schedules them sequentially and each
    chunk's ~1.8 KB/site EFT temporaries die before the next starts (14.2 GB
    -> O(chunk) at 3D refs=5, the difference between OOM and fitting)."""
    n0 = xh.shape[1]
    pad_x = [(0, 0), (1, 1)] + [(0, 0)] * (xh.ndim - 2)
    xhp = jnp.pad(xh, pad_x)
    xlp = jnp.pad(xl, pad_x)
    zrow_w = jnp.zeros(W.shape[:3] + (1,) + W.shape[4:], W.dtype)

    def w_rows(r0, r1):
        # W rows r0-1 .. r1, zero rows beyond the lattice: a full padded
        # copy of W would itself be a W-sized (GBs) temporary
        lo = max(r0 - 1, 0)
        hi = min(r1 + 1, n0)
        parts = []
        if r0 - 1 < 0:
            parts.append(zrow_w)
        parts.append(W[:, :, :, lo:hi])
        if r1 + 1 > n0:
            parts.append(zrow_w)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=3)

    ys_h, ys_l = [], []
    prev = None
    for r0 in range(0, n0, rc):
        r1 = min(n0, r0 + rc)
        ext = slice(r0, r1 + 2)  # rows r0-1 .. r1 in unpadded coords
        ch, cl = xhp[:, ext], xlp[:, ext]
        cw = w_rows(r0, r1)
        if prev is not None:
            (ch, cl, cw, prev) = jax.lax.optimization_barrier((ch, cl, cw, prev))
        yh, yl = inner(ps, cw, ch, cl)
        ys_h.append(yh[:, 1 : 1 + (r1 - r0)])
        ys_l.append(yl[:, 1 : 1 + (r1 - r0)])
        prev = yh
    return (
        jnp.concatenate(ys_h, axis=1),
        jnp.concatenate(ys_l, axis=1),
    )


def apply_w_df(ps: PatchSet, W, xh, xl):
    """Double-float operator application: y = A (xh + xl) with error-free
    products (ops.df) and compensated accumulation across all O*C stencil
    terms.  Returns an additive DF pair accurate to O(eps^2) - the
    once-per-refinement residual pass of the mixed-precision solve
    (solvers.patch_mg.cg_ir_p); the TPU substitute for the reference's f64
    defect evaluation at 1e-12 tolerances (obstacle_optim_util.lua:35).
    ~6x the flops of apply_w, but used outside the Krylov hot loop.

    On TPU with 3D sym-storage W, dispatches to the Pallas DF pencil
    kernel (ops.pallas_stencil._kernel_sym_df): the XLA EFT chain
    rematerializes full-lattice temporaries (measured 35x a plain apply at
    3D refs=4 = 65 ms, and needs the row-chunked barrier path at refs=5);
    the kernel streams W once with the (hi, lo) accumulators in VMEM.
    Other cases run the XLA forms, row-chunked (_apply_w_df_rows) on large
    lattices to bound the EFT temporary footprint."""
    from . import pallas_stencil

    if pallas_stencil.usable_df(ps, W, xh):
        yh, yl = pallas_stencil.apply_w_df_pallas(ps, W, xh, xl)
        return df.barrier_pair(yh, yl)
    if W.shape[0] != len(ps.stencil):
        # sym storage on the XLA fallback: EXPAND to full slots first.
        # The sym-specific XLA form (shifted-transpose contraction) loses
        # its EFT compensation when the whole expression compiles as one
        # XLA:CPU computation - measured 2.4e-8 value accuracy under jit
        # vs 1.1e-14 op-by-op, with optimization barriers at every seam
        # unable to restore it (the degradation sat cg_ir_p at ~3e-7
        # instead of 1e-9).  The full-stencil form is jit-exact, and this
        # path only runs where the Pallas DF kernel is unavailable
        # (non-TPU backends and 2D lattices), so the 2x W traffic is off
        # the production hot path.
        W = expand_sym_w(ps, W)
    rc = _df_row_chunk(xh, ps.dim)
    if rc is not None:
        return _apply_w_df_rows(ps, W, xh, xl, rc, _apply_w_df_full)
    return _apply_w_df_full(ps, W, xh, xl)


def _apply_w_df_full(ps: PatchSet, W, xh, xl):
    assert W.shape[0] == len(ps.stencil), "sym W must be expanded upstream"
    dim = ps.dim
    lat = xh.shape[1 : 1 + dim]
    C = W.shape[1]
    O = len(ps.stencil)
    pad = [(0, 0)] + [(1, 1)] * dim + [(0, 0)]
    xhp = jnp.pad(xh, pad)
    xlp = jnp.pad(xl, pad)

    def window(oi):
        o = ps.stencil[oi]
        sl = (
            (slice(None),)
            + tuple(slice(1 + int(oo), 1 + int(oo) + n) for oo, n in zip(o, lat))
            + (slice(None),)
        )
        return xhp[sl].reshape(C, -1), xlp[sl].reshape(C, -1)

    S = xh[0].size
    Wf = W.reshape(O, C, C, -1)  # (O, C, D, S)

    # unrolled fold over slots: each step reads one CONTIGUOUS W block and
    # folds its C exact products into the DF accumulator, with the slot
    # window sliced from the padded input on demand (a stacked (O, C, S)
    # window array costs 2x ~775 MB at 3D refs=5 - the allocation that
    # tipped one chip over HBM).  Deliberately NOT a lax.fori_loop: the
    # bitwise-identical body under fori_loop loses the compensation on
    # XLA:CPU (hi parts come back with plain-f32 rounding, lo parts
    # intact - an XLA loop-optimization artifact caught by
    # tests/test_df.py::test_apply_w_df_accuracy), and the
    # fully-materialized (O,C,D,S) broadcast costs 600 MB of temporaries.
    acc_h = jnp.zeros((C, S), xh.dtype)
    acc_l = acc_h
    for oi in range(O):
        w = Wf[oi]  # (C, D, S) static contiguous slice
        xh_o, xl_o = window(oi)
        for d in range(C):
            p, e = df.two_prod(w[:, d], xh_o[d][None])
            lo = e + w[:, d] * xl_o[d][None]
            acc_h, t = df.two_sum(acc_h, p)
            acc_l = acc_l + t + lo
    s, e = df.two_sum(acc_h, acc_l)
    s, e = df.barrier_pair(s, e)
    return s.reshape(xh.shape), e.reshape(xh.shape)


# ---------------------------------------------------------------------------
# consistency exchange / inner products / global glue
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SpmdCtx:
    """Spatial-SPMD context: the patch axis P is sharded over a named mesh
    axis (the TPU-native analogue of the reference's MPI domain
    decomposition, 2d_admm.lua:147-209).  Device d owns the contiguous patch
    block [d*Pl, (d+1)*Pl); geomgen emits bricks x-major so contiguous
    blocks are spatially coherent slabs of the channel.  All patchstencil
    primitives accept ``spmd`` and, when set, must run inside shard_map over
    that axis: halo coupling becomes all-gathers of tiny face slabs +
    psums (riding ICI), everything else stays patch-local."""

    axis: str
    nshards: int


_MAX_FACE_DELTAS = 4  # gather fallback beyond this many distinct strides


def compute_face_deltas(lvl: PatchLevel) -> tuple | None:
    """Static per-(axis, side) patch-index strides for the roll-based face
    fetch, or None when the adjacency is not near-constant-stride.

    geomgen emits bricks x-major on a (px, py, pz) grid, so the axis-a face
    neighbor of patch p is p +- stride_a except where the obstacle hole
    splits the grid (measured: <= 2 distinct deltas per face on the channel
    meshes).  The lane-axis gather slab[..., nbr] then becomes a sum of
    masked lane ROLLS - rolls are slices+concat at HBM bandwidth while TPU
    gathers run at ~1 output element/cycle (the exchange was ~2x the stencil
    apply's cost at 3D refs=4 before this).  Returns, per lattice axis, a
    pair of sorted delta tuples."""
    if not lvl.use_slab:
        return None
    ar = np.arange(lvl.P, dtype=np.int64)
    out = []
    for a in range(lvl.face_nbr.shape[0]):
        sides = []
        for sd in range(2):
            valid = lvl.face_mask[a, sd] > 0
            d = np.unique(lvl.face_nbr[a, sd][valid].astype(np.int64) - ar[valid])
            if len(d) > _MAX_FACE_DELTAS:
                return None
            sides.append(tuple(int(v) for v in d))
        out.append(tuple(sides))
    return tuple(out)


def _face_sel_masks(lvl: PatchLevel, face_deltas, dtype):
    """(ndeltas, P) roll-selection masks per (axis, side): mask k selects
    lanes whose axis neighbor sits at stride deltas[k], validity folded in.
    Wrapped roll lanes self-mask (nbr < P implies i + delta < P on
    selected lanes)."""
    ar = np.arange(lvl.P, dtype=np.int64)
    sel = []
    for a in range(lvl.face_nbr.shape[0]):
        sides = []
        for sd in range(2):
            valid = lvl.face_mask[a, sd] > 0
            ds = face_deltas[a][sd]
            m = np.zeros((max(len(ds), 1), lvl.P), np.float32)
            for k, d in enumerate(ds):
                m[k] = ((lvl.face_nbr[a, sd].astype(np.int64) - ar) == d) & valid
            sides.append(jnp.asarray(m, dtype))
        sel.append(tuple(sides))
    return tuple(sel)


def _corr_edge_tables(lvl: PatchLevel):
    """Edge-line write-back maps for the correction pass.

    Corr slots are lattice-EDGE sites in practice (sites duplicated by >2
    patches sit on brick edges/corners), so 12 (3D) / 4 (2D) O(edge-line)
    gathers replace the 2*dim O(face-slab) gathers, which dominated the
    exchange cost (measured 0.77 of 1.07 ms at 3D refs=4 on v5e; edge lines
    are ~lat x smaller than face slabs).  Returns (keys, maps): per edge a
    static key (a, side_a, b, side_b) and an (lat_rest..., P) int32 1-based
    group-id map - or (None, None) when some corr slot is not on an edge
    (inverted face pairs can leave face-interior corr slots; keep the face
    write-back then)."""
    if not lvl.use_slab or not lvl.corr_nseg:
        return None, None
    lat = lvl.lat_shape
    dim = len(lat)
    P = lvl.P
    mi = [np.asarray(v, np.int64) for v in lvl.corr_idx[:-1]]
    pch = np.asarray(lvl.corr_idx[-1], np.int64)
    corr_seg = lvl.corr_group_oh.argmax(axis=1).astype(np.int64)
    extreme = [
        (mi[a] == 0).astype(np.int8) + 2 * (mi[a] == lat[a] - 1)
        for a in range(dim)
    ]  # 0 = interior, 1 = lo face, 2 = hi face
    covered = np.zeros(len(pch), bool)
    keys, maps = [], []
    for a in range(dim):
        for b in range(a + 1, dim):
            for sa in range(2):
                for sb in range(2):
                    on = (extreme[a] == sa + 1) & (extreme[b] == sb + 1)
                    covered |= on
                    rest = [c for c in range(dim) if c not in (a, b)]
                    shape = tuple(lat[c] for c in rest) + (P,)
                    flat = np.zeros(len(pch), np.int64)
                    for c in rest:
                        flat = flat * lat[c] + mi[c]
                    flat = flat * P + pch
                    sm = np.zeros(int(np.prod(shape)), np.int32)
                    sm[flat[on]] = corr_seg[on] + 1
                    keys.append((a, sa, b, sb))
                    maps.append(sm.reshape(shape))
    if not covered.all():
        return None, None
    return tuple(keys), maps


def compute_halo_deltas(lvl: PatchLevel, nshards: int) -> tuple | None:
    """Static shard-offset sets for point-to-point halo exchange.

    With device d owning the contiguous patch block [d*Pl, (d+1)*Pl), the
    axis-a face neighbors of a shard's patches live on a SMALL static set of
    neighbor shards (typically {0, +-1}; at most a couple when the patch-grid
    stride along a exceeds Pl).  Returns, per lattice axis, a pair
    (lo_deltas, hi_deltas) of sorted int tuples - the shard offsets
    delta = shard(neighbor) - shard(self) observed over valid face entries -
    or None when the slab tables are absent / P is not shard-divisible.
    Consumed by _exchange_slab_spmd_pp: one lax.ppermute per nonzero delta
    replaces the all-gather of the face slab over every device."""
    if not lvl.use_slab or nshards <= 1 or lvl.P % nshards:
        return None
    Pl = lvl.P // nshards
    my_shard = np.arange(lvl.P, dtype=np.int64) // Pl
    out = []
    for a in range(lvl.face_nbr.shape[0]):
        sides = []
        for sd in range(2):
            valid = lvl.face_mask[a, sd] > 0
            d = np.unique(
                lvl.face_nbr[a, sd][valid].astype(np.int64) // Pl
                - my_shard[valid]
            )
            sides.append(tuple(int(v) for v in d))
        out.append(tuple(sides))
    return tuple(out)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LevelTables:
    """Device-side exchange/ownership tables for one patch level.

    A pytree meant to be passed as a jit ARGUMENT: baking these arrays in as
    constants (the jnp.asarray-inside-jit pattern) embeds tens of MB into
    every compiled program, which makes compiles minutes-slow and defeats
    the persistent compilation cache.

    Sharding layout (parallel.patch_shard): owner/free/gid carry the patch
    axis minor-most and are sharded over the spmd axis; neighbor/correction
    tables are small and replicated (each shard dynamic-slices its patch
    block)."""

    owner: jnp.ndarray
    free: jnp.ndarray
    face_nbr: jnp.ndarray | None
    face_mask: jnp.ndarray | None
    # roll-based face fetch (single-device fast path): per (axis, side)
    # (ndeltas, P) selection masks + static stride tuples (compute_face_deltas)
    face_sel: tuple | None
    corr_idx: tuple | None
    corr_group_oh: jnp.ndarray | None
    corr_slot: tuple | None  # per face: (*slab, P) int32 1-based group id
    # edge-line write-back (fast path; _corr_edge_tables): per edge key an
    # (lat_rest..., P) int32 1-based group-id map, replicated under spmd
    corr_edge_slot: tuple | None
    bslots: jnp.ndarray | None
    bseg: jnp.ndarray | None
    gid: jnp.ndarray | None = None  # (*lat, P) int32 global vertex ids
    # bucketed duplicate-group tables for the error-free double-float
    # exchange (exchange_sum_df): per distinct group size k, a dense
    # (g_k, k) flat-slot-index table - no padding lanes (most groups are
    # pairs; the old single (nseg, Kmax) padded table gathered ~Kmax/2x the
    # true member volume).  Group ids are renumbered bucket-major.
    dfg_bidx: tuple | None = None  # per bucket: (g_k, k) int32
    # face-slab write-back maps: per lattice face, (*slab, P) int32 1-based
    # group id (0 = keep) - duplicated sites live only on lattice boundary
    # faces, so 2*dim O(slab) gathers replace one O(lattice) gather.
    # Sharded on the patch axis under spmd, like the fields themselves.
    dfg_face_slot: tuple | None = None
    # dense (*lat, P) inverse map - defensive fallback if face coverage
    # ever fails (cannot happen for brick decompositions)
    dfg_slot: jnp.ndarray | None = None
    # static
    nseg: int = 0
    corr_nseg: int = 0
    use_slab: bool = False
    P_total: int = 0
    # static per-axis ((lo_deltas, hi_deltas), ...) shard offsets for the
    # point-to-point halo path (compute_halo_deltas); None = all-gather path
    halo_deltas: tuple | None = None
    # static per-axis ((lo_deltas, hi_deltas), ...) PATCH-index strides for
    # the roll-based face fetch (compute_face_deltas); None = gather path
    face_deltas: tuple | None = None
    # static edge keys (a, side_a, b, side_b) matching corr_edge_slot
    corr_edge_keys: tuple | None = None
    # static bucket sizes (k per bucket) matching dfg_bidx
    dfg_bsizes: tuple = ()

    def tree_flatten(self):
        children = (
            self.owner, self.free, self.face_nbr, self.face_mask,
            self.face_sel,
            self.corr_idx, self.corr_group_oh, self.corr_slot,
            self.corr_edge_slot,
            self.bslots, self.bseg, self.gid,
            self.dfg_bidx, self.dfg_face_slot, self.dfg_slot,
        )
        return children, (
            self.nseg, self.corr_nseg, self.use_slab, self.P_total,
            self.halo_deltas, self.face_deltas, self.corr_edge_keys,
            self.dfg_bsizes,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def _df_group_tables(lvl: PatchLevel):
    """Bucketed duplicate-group tables for exchange_sum_df.

    Groups are renumbered bucket-major (ascending member count); per
    distinct count k a dense (g_k, k) flat-slot table folds with NO padding
    lanes - most groups are pairs (3D refs=4: 130k of 138k), so the old
    single (nseg, Kmax=8) padded table gathered ~3.8x the true member
    volume.  Write-back goes through per-FACE slab maps: duplicated sites
    live only on lattice boundary faces, so 2*dim O(slab) gathers replace
    one O(lattice) gather through a dense inverse map.

    Returns (bucket_sizes, bucket_idx, face_slot, dense_slot); face_slot is
    None (with dense_slot set) only if some duplicated site is not on a
    lattice face - impossible for brick decompositions, kept defensive."""
    if lvl.nseg == 0:
        return (), None, None, None
    counts = np.bincount(lvl.bseg, minlength=lvl.nseg)
    order_g = np.argsort(counts, kind="stable")
    new_of_old = np.empty(lvl.nseg, np.int64)
    new_of_old[order_g] = np.arange(lvl.nseg)
    new_seg = new_of_old[lvl.bseg]
    order_m = np.argsort(new_seg, kind="stable")
    slots_s = lvl.bslots[order_m]
    counts_sorted = counts[order_g]
    sizes, bidx = [], []
    mpos = 0
    for k in np.unique(counts_sorted):
        g_k = int((counts_sorted == k).sum())
        k = int(k)
        sizes.append(k)
        bidx.append(slots_s[mpos : mpos + g_k * k].reshape(g_k, k))
        mpos += g_k * k
    assert mpos == len(slots_s)
    P = lvl.P
    lat = lvl.lat_shape
    dim = len(lat)
    site = lvl.bslots // P
    pch = (lvl.bslots % P).astype(np.int64)
    mi = np.unravel_index(site, lat)
    covered = np.zeros(len(lvl.bslots), bool)
    face_maps = []
    for f in range(2 * dim):
        a, sd = f // 2, f % 2
        onface = mi[a] == (0 if sd == 0 else lat[a] - 1)
        covered |= onface
        rest = [mi[b] for b in range(dim) if b != a]
        slab_shape = tuple(lat[b] for b in range(dim) if b != a) + (P,)
        flat = np.zeros(len(site), np.int64)
        for b, r in enumerate(rest):
            flat = flat * slab_shape[b] + r.astype(np.int64)
        flat = flat * P + pch
        sm = np.zeros(int(np.prod(slab_shape)), np.int32)
        sm[flat[onface]] = new_seg[onface] + 1
        face_maps.append(sm.reshape(slab_shape))
    if bool(covered.all()):
        return tuple(sizes), bidx, face_maps, None
    dense = np.zeros(int(np.prod(lat)) * P, np.int32)
    dense[lvl.bslots] = new_seg + 1
    return tuple(sizes), bidx, None, dense.reshape(lat + (P,))


def df_table_info(lvl: PatchLevel):
    """(bucket_sizes, faces_cover): static structure of the DF tables, for
    building spec pytrees that must match make_tables' output structure
    (parallel.patch_shard.table_specs)."""
    if lvl.nseg == 0:
        return (), True
    counts = np.bincount(lvl.bseg, minlength=lvl.nseg)
    sizes = tuple(int(k) for k in np.unique(counts))
    site = lvl.bslots // lvl.P
    mi = np.unravel_index(site, lvl.lat_shape)
    lat = lvl.lat_shape
    onb = np.zeros(len(lvl.bslots), bool)
    for a in range(len(lat)):
        onb |= (mi[a] == 0) | (mi[a] == lat[a] - 1)
    return sizes, bool(onb.all())


def make_tables(
    lvl: PatchLevel, dtype=jnp.float32, nshards: int | None = None
) -> LevelTables:
    slab = lvl.use_slab
    dfg_bsizes, dfg_bidx, dfg_face, dfg_slot = _df_group_tables(lvl)
    face_deltas = compute_face_deltas(lvl)
    edge_keys, edge_maps = _corr_edge_tables(lvl)
    return LevelTables(
        owner=jnp.asarray(lvl.owner, dtype),
        free=jnp.asarray(lvl.free, dtype),
        face_nbr=jnp.asarray(lvl.face_nbr) if slab else None,
        face_mask=jnp.asarray(lvl.face_mask, dtype) if slab else None,
        face_sel=(
            _face_sel_masks(lvl, face_deltas, dtype)
            if face_deltas is not None
            else None
        ),
        corr_idx=(
            tuple(jnp.asarray(i) for i in lvl.corr_idx)
            if slab and lvl.corr_nseg
            else None
        ),
        corr_group_oh=(
            jnp.asarray(lvl.corr_group_oh, dtype) if slab and lvl.corr_nseg else None
        ),
        corr_slot=(
            tuple(jnp.asarray(sm) for sm in lvl.corr_slot)
            if slab and lvl.corr_nseg
            else None
        ),
        corr_edge_slot=(
            tuple(jnp.asarray(sm) for sm in edge_maps)
            if edge_maps is not None
            else None
        ),
        bslots=None if slab else jnp.asarray(lvl.bslots),
        bseg=None if slab else jnp.asarray(lvl.bseg),
        gid=jnp.moveaxis(jnp.asarray(lvl.gid), 0, -1),
        dfg_bidx=(
            None
            if dfg_bidx is None
            else tuple(jnp.asarray(b, jnp.int32) for b in dfg_bidx)
        ),
        dfg_face_slot=(
            None
            if dfg_face is None
            else tuple(jnp.asarray(sm) for sm in dfg_face)
        ),
        dfg_slot=None if dfg_slot is None else jnp.asarray(dfg_slot, jnp.int32),
        nseg=lvl.nseg,
        corr_nseg=lvl.corr_nseg,
        use_slab=slab,
        P_total=lvl.P,
        halo_deltas=compute_halo_deltas(lvl, nshards) if nshards else None,
        face_deltas=face_deltas,
        corr_edge_keys=edge_keys,
        dfg_bsizes=dfg_bsizes,
    )


def _shard_offset(tab: LevelTables, Pl: int, spmd: SpmdCtx):
    """First global patch id of this shard's contiguous block."""
    return jax.lax.axis_index(spmd.axis) * Pl


def exchange_sum(
    lvl: PatchLevel, x, tab: LevelTables | None = None, spmd: SpmdCtx | None = None
):
    """additive -> consistent: sum duplicated boundary sites (psum analogue
    of UG4's change_storage_type_to_consistent, 2d_admm.lua:904).

    Fast path (use_slab, verified at build time): `dim` sequential axis
    sweeps; each adds the axis-neighbor's opposite face slab via one tiny
    patch-axis gather + static slab writes; staircase-broken edge/corner
    groups are fixed scatter-free via one-hot matmuls.  Measured ~7x faster
    than the segment-sum path on v5e (dynamic scatters into large arrays
    cost ~5 ms regardless of index count).

    With ``spmd`` set (inside shard_map, patch axis sharded) this is the
    halo exchange: each sweep all-gathers the two face slabs over the mesh
    axis (the only inter-device traffic; O(lat^(d-1) * P) elements) and the
    correction pass psums the Bc edge/corner values."""
    if tab is None:
        tab = make_tables(lvl, x.dtype)
    if tab.use_slab:
        return _exchange_slab(tab, x) if spmd is None else _exchange_slab_spmd(
            tab, x, spmd
        )
    if spmd is not None:
        return _exchange_segsum_spmd(tab, x, spmd)
    return _exchange_segsum(tab, x)


def _exchange_segsum(tab: LevelTables, x):
    C = x.shape[0]
    xf = x.reshape(C, -1)
    xb = xf[:, tab.bslots]  # (C, B)
    s = jax.vmap(
        lambda v: jax.ops.segment_sum(v, tab.bseg, num_segments=tab.nseg)
    )(xb)
    return xf.at[:, tab.bslots].set(s[:, tab.bseg]).reshape(x.shape)


def _face_fetch(tab: LevelTables, slab_src, a, sd):
    """Neighbor face values for axis a, side sd: validity-masked, zeros
    where no neighbor.  Roll path when the adjacency is constant-stride
    (compute_face_deltas; lane rolls are slices at HBM bandwidth), lane
    gather otherwise (~1 element/cycle on TPU)."""
    if tab.face_deltas is not None:
        out = None
        for k, d in enumerate(tab.face_deltas[a][sd]):
            sel = tab.face_sel[a][sd][k].astype(slab_src.dtype)
            t = (jnp.roll(slab_src, -d, axis=-1) if d else slab_src) * sel
            out = t if out is None else out + t
        return jnp.zeros_like(slab_src) if out is None else out
    nbr = tab.face_nbr
    mask = tab.face_mask.astype(slab_src.dtype)
    return slab_src[..., nbr[a, sd]] * mask[a, sd]


def _exchange_slab(tab: LevelTables, x):
    dim = x.ndim - 2  # (C, *lat, P)
    C = x.shape[0]
    lat = x.shape[1 : 1 + dim]
    x_in = x
    for a in range(dim):
        lo = [slice(None)] * (dim + 2)
        hi = [slice(None)] * (dim + 2)
        lo[1 + a], hi[1 + a] = 0, lat[a] - 1
        lo, hi = tuple(lo), tuple(hi)
        slab_lo, slab_hi = x[lo], x[hi]
        new_lo = slab_lo + _face_fetch(tab, slab_hi, a, 0)
        new_hi = slab_hi + _face_fetch(tab, slab_lo, a, 1)
        x = x.at[lo].set(new_lo).at[hi].set(new_hi)
    if tab.corr_nseg:
        vals = x_in[(slice(None),) + tab.corr_idx]
        sums = vals @ tab.corr_group_oh.astype(x.dtype)  # (C, G)
        sums0 = jnp.concatenate([jnp.zeros((C, 1), x.dtype), sums], axis=1)
        if tab.corr_edge_slot is not None:
            # edge-line write-back: ~lat x less gather volume than faces
            for (a, sa, b, sb), sm in zip(tab.corr_edge_keys, tab.corr_edge_slot):
                sl = [slice(None)] * (dim + 2)
                sl[1 + a] = 0 if sa == 0 else lat[a] - 1
                sl[1 + b] = 0 if sb == 0 else lat[b] - 1
                sl = tuple(sl)
                dense = sums0[:, sm]  # (C, *line, P) gather
                x = x.at[sl].set(jnp.where((sm > 0)[None], dense, x[sl]))
            return x
        for f in range(2 * dim):
            a, sd = f // 2, f % 2
            sl = [slice(None)] * (dim + 2)
            sl[1 + a] = 0 if sd == 0 else lat[a] - 1
            sl = tuple(sl)
            sm = tab.corr_slot[f]  # (*slab, P) int32, 0 = keep
            dense = sums0[:, sm]  # (C, *slab, P) gather
            x = x.at[sl].set(jnp.where((sm > 0)[None], dense, x[sl]))
    return x


def _exchange_slab_spmd(tab: LevelTables, x, spmd: SpmdCtx):
    """Halo-exchange slab sweep for a patch-sharded x (inside shard_map).

    Identical arithmetic to _exchange_slab.  Per lattice axis the two face
    slabs travel over the mesh axis (the only halo traffic; everything else
    is shard-local) in one of two ways:
      * point-to-point (tab.halo_deltas set): one lax.ppermute per static
        neighbor-shard offset - O(|deltas|) slabs of ICI traffic, the
        MPI-neighbor-exchange analogue;
      * all-gather fallback (halo_deltas None): gather the slab across all
        shards - O(nshards) traffic, kept for tables built without a shard
        count.
    The correction pass psums the Bc staircase-broken edge/corner values
    (replicated small vector)."""
    dim = x.ndim - 2  # (C, *lat, P_local)
    lat = x.shape[1 : 1 + dim]
    Pl = x.shape[-1]
    off = _shard_offset(tab, Pl, spmd)
    nbr = tab.face_nbr  # (dim, 2, P) global, replicated
    mask = tab.face_mask.astype(x.dtype)
    x_in = x
    pp = tab.halo_deltas is not None
    shard_id = jax.lax.axis_index(spmd.axis) if pp else None
    for a in range(dim):
        lo = [slice(None)] * (dim + 2)
        hi = [slice(None)] * (dim + 2)
        lo[1 + a], hi[1 + a] = 0, lat[a] - 1
        lo, hi = tuple(lo), tuple(hi)
        slab_lo, slab_hi = x[lo], x[hi]  # (C, *rest, Pl)
        nbr_lo = jax.lax.dynamic_slice_in_dim(nbr[a, 0], off, Pl, axis=0)
        nbr_hi = jax.lax.dynamic_slice_in_dim(nbr[a, 1], off, Pl, axis=0)
        m_lo = jax.lax.dynamic_slice_in_dim(mask[a, 0], off, Pl, axis=0)
        m_hi = jax.lax.dynamic_slice_in_dim(mask[a, 1], off, Pl, axis=0)
        if pp:
            # point-to-point: one ppermute per static neighbor-shard offset
            # (compute_halo_deltas) - O(|deltas|) slabs over ICI instead of
            # the O(nshards) all-gather
            d_lo, d_hi = tab.halo_deltas[a]
            add_lo = _pp_neighbor_vals(
                slab_hi, nbr_lo, d_lo, Pl, shard_id, spmd
            )
            add_hi = _pp_neighbor_vals(
                slab_lo, nbr_hi, d_hi, Pl, shard_id, spmd
            )
        else:
            lo_all = jax.lax.all_gather(
                slab_lo, spmd.axis, axis=slab_lo.ndim - 1, tiled=True
            )
            hi_all = jax.lax.all_gather(
                slab_hi, spmd.axis, axis=slab_hi.ndim - 1, tiled=True
            )
            add_lo = hi_all[..., nbr_lo]
            add_hi = lo_all[..., nbr_hi]
        x = x.at[lo].set(slab_lo + add_lo * m_lo).at[hi].set(
            slab_hi + add_hi * m_hi
        )
    C = x.shape[0]
    if tab.corr_nseg:
        lat_idx = tab.corr_idx[:-1]
        pch = tab.corr_idx[-1]  # (Bc,) global patch ids
        local = (pch >= off) & (pch < off + Pl)
        pl_idx = jnp.clip(pch - off, 0, Pl - 1)
        vals = x_in[(slice(None),) + lat_idx + (pl_idx,)] * local.astype(x.dtype)
        vals = jax.lax.psum(vals, spmd.axis)  # (C, Bc) replicated
        sums = vals @ tab.corr_group_oh.astype(x.dtype)  # (C, G)
        sums0 = jnp.concatenate([jnp.zeros((C, 1), x.dtype), sums], axis=1)
        if tab.corr_edge_slot is not None:
            for (a, sa, b, sb), sm in zip(tab.corr_edge_keys, tab.corr_edge_slot):
                sl = [slice(None)] * (dim + 2)
                sl[1 + a] = 0 if sa == 0 else lat[a] - 1
                sl[1 + b] = 0 if sb == 0 else lat[b] - 1
                sl = tuple(sl)
                sm_loc = jax.lax.dynamic_slice_in_dim(
                    sm, off, Pl, axis=sm.ndim - 1
                )
                dense = sums0[:, sm_loc]
                x = x.at[sl].set(jnp.where((sm_loc > 0)[None], dense, x[sl]))
            return x
        for f in range(2 * dim):
            a, sd = f // 2, f % 2
            sl = [slice(None)] * (dim + 2)
            sl[1 + a] = 0 if sd == 0 else lat[a] - 1
            sl = tuple(sl)
            sm = tab.corr_slot[f]  # (*slab, P_total) int32, replicated
            sm_loc = jax.lax.dynamic_slice_in_dim(sm, off, Pl, axis=sm.ndim - 1)
            dense = sums0[:, sm_loc]  # (C, *slab, Pl) gather
            x = x.at[sl].set(jnp.where((sm_loc > 0)[None], dense, x[sl]))
    return x


def _pp_neighbor_vals(slab_src, nbr_idx, deltas, Pl, shard_id, spmd):
    """sum over static shard offsets d of
    ppermute(slab_src from shard i+d)[..., nbr % Pl] * (nbr // Pl == i+d).
    Masked (invalid-neighbor) entries contribute garbage here and are zeroed
    by the caller's face mask."""
    n_mod = nbr_idx % Pl
    n_shard = (nbr_idx // Pl).astype(jnp.int32)
    D = spmd.nshards
    out = None
    for d in deltas:
        if d == 0:
            recv = slab_src
        else:
            perm = [(j, j - d) for j in range(D) if 0 <= j - d < D]
            recv = jax.lax.ppermute(slab_src, spmd.axis, perm)
        sel = (n_shard == shard_id + d).astype(slab_src.dtype)
        term = recv[..., n_mod] * sel
        out = term if out is None else out + term
    return jnp.zeros_like(slab_src) if out is None else out


def _exchange_segsum_spmd(tab: LevelTables, x, spmd: SpmdCtx):
    """General duplicate-sum under patch sharding: psum the (C, B) boundary
    values (B = total duplicated slots) and write back the local ones.
    Fallback for non-composable brick adjacencies; the slab path is the
    fast one."""
    C = x.shape[0]
    Pl = x.shape[-1]
    P = tab.P_total
    off = _shard_offset(tab, Pl, spmd)
    site = tab.bslots // P
    pch = (tab.bslots % P).astype(jnp.int32)
    local = (pch >= off) & (pch < off + Pl)
    loc_flat = site * Pl + jnp.clip(pch - off, 0, Pl - 1)
    xf = x.reshape(C, -1)
    vals = xf[:, loc_flat] * local.astype(x.dtype)  # (C, B)
    vals = jax.lax.psum(vals, spmd.axis)
    s = jax.vmap(
        lambda v: jax.ops.segment_sum(v, tab.bseg, num_segments=tab.nseg)
    )(vals)
    out = s[:, tab.bseg]  # (C, B) consistent values for every duplicate slot
    # masked write-back: route non-local slots to a sacrificial padding column
    wf = jnp.where(local, loc_flat, xf.shape[1])
    xp = jnp.pad(xf, ((0, 0), (0, 1)))
    xp = xp.at[:, wf].set(out)
    return xp[:, :-1].reshape(x.shape)


def exchange_sum_df(tab: LevelTables, xh, xl, spmd: SpmdCtx | None = None):
    """additive -> consistent for a double-float pair, ERROR-FREE.

    The plain exchanges round each duplicate add (eps*|y| error), which
    would cap mixed-precision residuals at ~1e-7; here duplicate groups are
    gathered into the padded (nseg, K) table and folded with two_sum, so
    the consistent sum is exact to O(eps^2).  Only used in the residual
    pass; Krylov/smoother iterations keep the fast f32 exchanges.

    (A faster slab variant - DF face adds + a small corner fold - was
    removed: under jit, XLA rematerializes parts of its hi-path into
    differently-contracted fusions, making the pair internally
    inconsistent at sweep-composed corners; the group fold has no such
    duplicated seams and is verified exact inside jitted loops.)

    Under ``spmd`` each slot's value lives on exactly one shard; psums of
    zero-masked values are exact (adding zeros is error-free)."""
    if not tab.dfg_bsizes:
        return xh, xl
    C = xh.shape[0]
    xfh = xh.reshape(C, -1)
    xfl = xl.reshape(C, -1)
    # bucketed group folds: per distinct group size k a dense (g_k, k)
    # gather + two_sum chain - no padding lanes (most groups are pairs)
    sums_h, sums_l = [], []
    for bi, k in enumerate(tab.dfg_bsizes):
        idx = tab.dfg_bidx[bi]  # (g_k, k)
        if spmd is None:
            vh = xfh[:, idx]
            vl = xfl[:, idx]
        else:
            Pl = xh.shape[-1]
            P = tab.P_total
            off = _shard_offset(tab, Pl, spmd)
            site = idx // P
            pch = idx % P
            local = (pch >= off) & (pch < off + Pl)
            loc_flat = site * Pl + jnp.clip(pch - off, 0, Pl - 1)
            m = local.astype(xh.dtype)
            vh = jax.lax.psum(xfh[:, loc_flat] * m, spmd.axis)
            vl = jax.lax.psum(xfl[:, loc_flat] * m, spmd.axis)
        sh, sl_ = vh[..., 0], vl[..., 0]
        for j in range(1, k):
            sh, e = df.two_sum(sh, vh[..., j])
            sl_ = sl_ + e + vl[..., j]
        sums_h.append(sh)
        sums_l.append(sl_)
    sh = jnp.concatenate(sums_h, axis=1)  # (C, nseg), bucket-major ids
    sl_ = jnp.concatenate(sums_l, axis=1)
    sh, sl_ = df.two_sum(sh, sl_)
    pad = jnp.zeros((C, 1), xh.dtype)
    sh0 = jnp.concatenate([pad, sh], axis=1)
    sl0 = jnp.concatenate([pad, sl_], axis=1)
    if tab.dfg_face_slot is not None:
        # face-slab write-back: duplicated sites live only on lattice
        # boundary faces; 2*dim O(slab) gathers instead of one O(lattice)
        # gather.  Writing a shared edge/corner site from several faces is
        # idempotent (same group value).  dfg_face_slot shards like the
        # field itself, so the spmd path needs no index translation.
        dim = xh.ndim - 2
        lat = xh.shape[1 : 1 + dim]
        outh, outl = xh, xl
        for f in range(2 * dim):
            a, sd = f // 2, f % 2
            sl = [slice(None)] * (dim + 2)
            sl[1 + a] = 0 if sd == 0 else lat[a] - 1
            sl = tuple(sl)
            sm = tab.dfg_face_slot[f]  # (*slab, P[_local]) int32, 0 = keep
            gh = sh0[:, sm]
            gl = sl0[:, sm]
            dup = (sm > 0)[None]
            outh = outh.at[sl].set(jnp.where(dup, gh, outh[sl]))
            outl = outl.at[sl].set(jnp.where(dup, gl, outl[sl]))
        return df.barrier_pair(outh, outl)
    # defensive dense fallback (duplicates off the lattice boundary)
    gidx = tab.dfg_slot.reshape(-1)  # (S_loc,)
    gh = sh0[:, gidx]  # (C, S_loc)
    gl = sl0[:, gidx]
    dup = (gidx > 0)[None]
    outh = jnp.where(dup, gh, xfh)
    outl = jnp.where(dup, gl, xfl)
    return df.barrier_pair(outh.reshape(xh.shape), outl.reshape(xl.shape))


def owner_dot(
    lvl: PatchLevel, x, y, tab: LevelTables | None = None, spmd: SpmdCtx | None = None
):
    """Global inner product of two consistent patch vectors."""
    w = tab.owner.astype(x.dtype) if tab is not None else jnp.asarray(lvl.owner, x.dtype)
    d = jnp.sum(x * y * w[None])
    return d if spmd is None else jax.lax.psum(d, spmd.axis)


def to_patch(lvl: PatchLevel, v_global):
    """global (C, V) consistent -> patch (C, *lat, P)."""
    gid = jnp.asarray(lvl.gid)  # (P, *lat)
    g = jnp.moveaxis(gid, 0, -1)  # (*lat, P)
    return v_global[:, g]


def from_patch(lvl: PatchLevel, x, n_vertices: int, mode: str = "owner"):
    """patch (C, *lat, P) -> global (C, V).

    mode "owner": pick each site's owning copy (consistent input);
    mode "sum":   sum all copies (additive input)."""
    C = x.shape[0]
    gid = jnp.moveaxis(jnp.asarray(lvl.gid), 0, -1).reshape(-1)  # (S*P,)
    xf = x.reshape(C, -1)
    if mode == "owner":
        xf = xf * jnp.asarray(lvl.owner, x.dtype).reshape(-1)[None]
    return jax.vmap(
        lambda v: jax.ops.segment_sum(v, gid, num_segments=n_vertices)
    )(xf)


def to_patch_tab(tab: LevelTables, v_global):
    """global (C, V) consistent (replicated under spmd) -> patch local."""
    return v_global[:, tab.gid]


def from_patch_tab(
    tab: LevelTables, x, n_vertices: int, mode: str = "owner",
    spmd: SpmdCtx | None = None,
):
    """patch (C, *lat, P[_local]) -> global (C, V), replicated under spmd
    (the gathered-base-solve glue; reference's gatheredBaseSolverIfAmbiguous,
    obstacle_optim_util.lua:21)."""
    C = x.shape[0]
    xf = x.reshape(C, -1)
    if mode == "owner":
        xf = xf * tab.owner.astype(x.dtype).reshape(-1)[None]
    out = jax.vmap(
        lambda v: jax.ops.segment_sum(
            v, tab.gid.reshape(-1), num_segments=n_vertices
        )
    )(xf)
    return out if spmd is None else jax.lax.psum(out, spmd.axis)


# ---------------------------------------------------------------------------
# MG transfers (pure parity-strided slicing; see core.patches gid rule)
# ---------------------------------------------------------------------------

def _parity_slices(dim, pc, m):
    """(new-lattice odd-site slices, parent1 slices, parent2 slices) for
    parity class pc on the coarse lattice of size m+1."""
    h = [(pc >> (dim - 1 - a)) & 1 for a in range(dim)]
    sl_new = tuple(slice(hh, None, 2) for hh in h)
    sl_p1 = tuple(slice(0, m + 1 - hh) for hh in h)
    sl_p2 = tuple(slice(hh, m + 1) for hh in h)
    return sl_new, sl_p1, sl_p2


def prolong_p(ps: PatchSet, level_coarse: int, xc):
    """consistent coarse (C, *latc, P) -> consistent fine (C, *latf, P).
    P1 interpolation: copy even sites, average edge parents at odd sites."""
    dim = ps.dim
    m = ps.levels[level_coarse].m
    latf = tuple(2 * m + 1 for _ in range(dim))
    xf = jnp.zeros(xc.shape[:1] + latf + xc.shape[-1:], xc.dtype)
    pre = (slice(None),)
    xf = xf.at[pre + tuple(slice(0, None, 2) for _ in range(dim))].set(xc)
    for pc in range(1, 2**dim):
        sl_new, sl_p1, sl_p2 = _parity_slices(dim, pc, m)
        xf = xf.at[pre + sl_new].set(0.5 * (xc[pre + sl_p1] + xc[pre + sl_p2]))
    return xf


def restrict_p(ps: PatchSet, level_coarse: int, rf):
    """additive fine (C, *latf, P) -> additive coarse (transpose of
    prolong_p)."""
    dim = ps.dim
    m = ps.levels[level_coarse].m
    pre = (slice(None),)
    rc = rf[pre + tuple(slice(0, None, 2) for _ in range(dim))]
    for pc in range(1, 2**dim):
        sl_new, sl_p1, sl_p2 = _parity_slices(dim, pc, m)
        odd = 0.5 * rf[pre + sl_new]
        rc = rc.at[pre + sl_p1].add(odd)
        rc = rc.at[pre + sl_p2].add(odd)
    return rc
