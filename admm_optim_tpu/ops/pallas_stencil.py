"""Pallas TPU kernel for the brick-patch stencil apply (3D).

The XLA lowering of ops.patchstencil.apply_w moves ~4x the stencil's
physical bytes through HBM (measured 252 GB/s effective vs ~800 available
on v5e at 3D refs=5: 23.9 ms for a 5.6 GiB-physical W): the stacked slot
windows and per-slot accumulation passes re-materialize full-lattice
intermediates.  This kernel streams W exactly once, holds the x halo
neighborhood in VMEM, and accumulates all 15 slots in registers - the
brick-lattice analogue of the reference's C++ element-loop matvec
(AssembledLinearOperator apply, 2d_admm.lua:331,954), tuned for the TPU
memory hierarchy instead of cache blocking.

Layout contract (matches ops.patchstencil):
  W: (O, C, C, n0, n1, n2, P) slot-major full stencil
  x: (C, n0, n1, n2, P)
  y: (C, n0, n1, n2, P) patch-local products; duplicated boundary sites
     are summed afterwards by patchstencil.exchange_sum, exactly as for
     the XLA apply_w.

Grid (n0, n1, n_slot_chunks): one (row, column) pencil of the lattice per
program, slots processed in chunks (innermost axis) so the W block stays
well under VMEM; the output block's index map ignores the slot axis, so
Pallas keeps it resident in VMEM across the reduction and writes it back
once (standard revisited-output reduction pattern).

Dispatch contract (ops.patchstencil.apply_w): kernels here cover the 3D
lattices only - slot-major full/sym (`usable`), pencil-contiguous
(dispatched by the explicit patchstencil.PencilW layout tag), and the DF
sym variant (`usable_df`).  **2D lattices always
take the XLA apply path**: at 2D sizes (the largest 2D level in the tree
is ~66k sites at refs=5 on refined.ugx) the stencil is 9-slot/2-channel
and the XLA form's full-lattice windows fit comfortably in cache-resident
fusions, so the measured kernel win (which comes from streaming multi-GB
3D W exactly once) has no 2D counterpart worth the Mosaic surface.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# toggle for experiments / debugging (see patchstencil.apply_w dispatch)
ENABLED = True

# slots per grid step: VMEM budget.  W chunk = SC*C*C*(n2~33->40, P~224->256)
# f32 ~ 2 MB, double-buffered ~4 MB; x halo blocks ~1.1 MB; y ~1.5 MB.
_SLOT_CHUNK = 5
# sym variant: the 7 shifted pair blocks (~2.6 MB doubled) are resident on
# top of the direct chunk, so keep direct chunks smaller
_SYM_SLOT_CHUNK = 4
# DF variant additionally holds the lo-part x halo blocks and a second
# output block
_DF_SLOT_CHUNK = 4


def _kernel(stencil, nsl, n2, kept_xidx, *refs):
    """refs = (*x_refs, w_ref, y_ref); x_refs are the halo (di, dj) row/col
    blocks actually used by the stencil, in kept_xidx order."""
    n_x = len(kept_xidx)
    x_refs = refs[:n_x]
    w_ref = refs[n_x]
    y_ref = refs[n_x + 1]
    xpos = {k: i for i, k in enumerate(kept_xidx)}
    os_ = pl.program_id(2)
    C = y_ref.shape[0]
    O = len(stencil)

    @pl.when(os_ == 0)
    def _init():
        y_ref[...] = jnp.zeros_like(y_ref)

    # slot chunk [os_*nsl, os_*nsl+nsl): static python loop over the chunk
    # offset; the chunk membership test is static per unrolled iteration via
    # lax.cond-free masking: we unroll ALL slots but gate each on its chunk
    # with pl.when on the scalar program id (cheap scalar compare).
    for oi, o in enumerate(stencil):
        chunk = oi // nsl

        @pl.when(os_ == chunk)
        def _do(oi=oi, o=o):
            o0, o1, o2 = (int(v) for v in o)
            xr = x_refs[xpos[(o0 + 1, o1 + 1)]]
            acc = [None] * C
            for d in range(C):
                xs = xr[d, 0, 0, pl.ds(1 + o2, n2), :]  # (n2, P)
                for c in range(C):
                    t = w_ref[oi - chunk * nsl, c, d, 0, 0] * xs
                    acc[c] = t if acc[c] is None else acc[c] + t
            for c in range(C):
                y_ref[c, 0, 0] += acc[c]


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def _apply_w_pallas_3d(stencil, nsl, W, x, interpret=False):
    O, C, _, n0, n1, n2, P = W.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    # only the (di, dj) halo combinations the stencil reaches (15-slot Kuhn
    # stencils use all 9 in 3D; keep general for other stencils)
    kept = sorted({(int(o[0]) + 1, int(o[1]) + 1) for o in stencil})
    nos = -(-O // nsl)
    # pad W's slot axis to a multiple of the chunk (zero slots are harmless:
    # they multiply the center window and add 0... they'd read x; make the
    # padding replicate slot 0 with ZERO weights so reads stay in bounds)
    if nos * nsl != O:
        pad = nos * nsl - O
        W = jnp.concatenate([W, jnp.zeros((pad,) + W.shape[1:], W.dtype)], 0)
    stencil_padded = tuple(tuple(int(v) for v in o) for o in stencil) + (
        ((0, 0, 0),) * (nos * nsl - O)
    )

    x_specs = [
        pl.BlockSpec(
            (C, 1, 1, n2 + 2, P),
            functools.partial(
                lambda di, dj, i, j, s: (0, i + di, j + dj, 0, 0), di, dj
            ),
        )
        for (di, dj) in kept
    ]
    w_spec = pl.BlockSpec(
        (nsl, C, C, 1, 1, n2, P), lambda i, j, s: (s, 0, 0, i, j, 0, 0)
    )
    y_spec = pl.BlockSpec((C, 1, 1, n2, P), lambda i, j, s: (0, i, j, 0, 0))

    kern = functools.partial(_kernel, stencil_padded, nsl, n2, tuple(kept))
    y = pl.pallas_call(
        kern,
        grid=(n0, n1, nos),
        in_specs=[*x_specs, w_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((C, n0, n1, n2, P), x.dtype),
        interpret=interpret,
    )(*([xp] * len(kept)), W)
    return y


def _kernel_sym(stencil, kept, missing, nsl, n2, kept_xidx, *refs):
    """Symmetric half-stencil kernel.  refs = (*x_refs, w_dir_ref,
    *w_shift_refs, y_ref).

    Direct (stored) slots contract exactly as in _kernel.  Each MISSING
    slot o reads its pair slot's W block from the pencil at (i+o0, j+o1)
    (index map, edge-clamped) with rows shifted by o2 and the (c, d)
    indices transposed: y[c, s] += sum_d W[pair][d, c, s+o] x[d, s+o].
    Edge clamping is harmless because x's zero halo annihilates every
    out-of-lattice term, so W garbage there multiplies zero."""
    n_x = len(kept_xidx)
    x_refs = refs[:n_x]
    w_dir = refs[n_x]
    w_shift = refs[n_x + 1 : n_x + 1 + len(missing)]
    y_ref = refs[n_x + 1 + len(missing)]
    xpos = {k: i for i, k in enumerate(kept_xidx)}
    os_ = pl.program_id(2)
    nos = pl.num_programs(2)
    C = y_ref.shape[0]

    @pl.when(os_ == 0)
    def _init():
        y_ref[...] = jnp.zeros_like(y_ref)

    for h, slot_idx in enumerate(kept):
        chunk = h // nsl

        @pl.when(os_ == chunk)
        def _direct(h=h, slot_idx=slot_idx, chunk=chunk):
            o0, o1, o2 = (int(v) for v in stencil[slot_idx])
            xr = x_refs[xpos[(o0 + 1, o1 + 1)]]
            acc = [None] * C
            for d in range(C):
                xs = xr[d, 0, 0, pl.ds(1 + o2, n2), :]
                for c in range(C):
                    t = w_dir[h - chunk * nsl, c, d, 0, 0] * xs
                    acc[c] = t if acc[c] is None else acc[c] + t
            for c in range(C):
                y_ref[c, 0, 0] += acc[c]

    n_chunks = -(-len(kept) // nsl)
    for t, (oi, _pair) in enumerate(missing):

        @pl.when(os_ == (t % n_chunks))
        def _transpose(t=t, oi=oi):
            # contribution of missing slot mu = stencil[oi] = -o (o stored):
            # y(s) += z(s + mu2) with z(r) = W_o(r)^T x(r), BOTH read at the
            # (i+mu0, j+mu1) pencil with ALIGNED rows - one zero-fill shift
            # of the C contracted products instead of C*C shifted-W copies
            # (measured: the per-(d,c) W row concats were ~40% of the
            # transpose branch's VPU time)
            o0, o1, o2 = (int(v) for v in stencil[oi])
            xr = x_refs[xpos[(o0 + 1, o1 + 1)]]
            acc = [None] * C
            for d in range(C):
                xs = xr[d, 0, 0, pl.ds(1, n2), :]  # centered rows
                for c in range(C):
                    t_ = w_shift[t][0, d, c, 0, 0] * xs  # (d, c): transpose
                    acc[c] = t_ if acc[c] is None else acc[c] + t_
            for c in range(C):
                u = acc[c]
                if o2 == 1:
                    u = jnp.concatenate(
                        [u[1:, :], jnp.zeros_like(u[:1, :])], axis=0
                    )
                elif o2 == -1:
                    u = jnp.concatenate(
                        [jnp.zeros_like(u[:1, :]), u[: n2 - 1, :]], axis=0
                    )
                y_ref[c, 0, 0] += u


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5))
def _apply_w_pallas_3d_sym(stencil, kept, nsl, W, x, interpret=False):
    """Symmetric half-stencil storage (H, C, C, n0, n1, n2, P): same HBM
    traffic as the full-stencil kernel (15 slot-block fetches per pencil)
    but half the stored bytes and no expand_sym_w transient - the refs=5
    full-W expansion OOMed one chip (sym + full + stack copy)."""
    H, C, _, n0, n1, n2, P = W.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    kept_x = sorted({(int(o[0]) + 1, int(o[1]) + 1) for o in stencil})
    pos = {k: i for i, k in enumerate(kept)}
    neg = {}
    for oi, o in enumerate(stencil):
        neg[oi] = stencil.index(tuple(-v for v in o))
    missing = tuple(
        (oi, pos[neg[oi]]) for oi in range(len(stencil)) if oi not in pos
    )
    nos = -(-H // nsl)
    if nos * nsl != H:
        pad = nos * nsl - H
        W = jnp.concatenate([W, jnp.zeros((pad,) + W.shape[1:], W.dtype)], 0)
        kept = tuple(kept) + tuple(kept[:1]) * pad  # zero weights: harmless

    x_specs = [
        pl.BlockSpec(
            (C, 1, 1, n2 + 2, P),
            functools.partial(
                lambda di, dj, i, j, s: (0, i + di, j + dj, 0, 0), di, dj
            ),
        )
        for (di, dj) in kept_x
    ]
    w_dir_spec = pl.BlockSpec(
        (nsl, C, C, 1, 1, n2, P), lambda i, j, s: (s, 0, 0, i, j, 0, 0)
    )

    def _shift_map(o0, o1, pair, i, j, s):
        ii = jnp.clip(i + o0, 0, n0 - 1)
        jj = jnp.clip(j + o1, 0, n1 - 1)
        return (pair, 0, 0, ii, jj, 0, 0)

    w_shift_specs = [
        pl.BlockSpec(
            (1, C, C, 1, 1, n2, P),
            functools.partial(
                _shift_map,
                int(stencil[oi][0]),
                int(stencil[oi][1]),
                pair,
            ),
        )
        for (oi, pair) in missing
    ]
    y_spec = pl.BlockSpec((C, 1, 1, n2, P), lambda i, j, s: (0, i, j, 0, 0))

    kern = functools.partial(
        _kernel_sym, stencil, tuple(kept), missing, nsl, n2, tuple(kept_x)
    )
    y = pl.pallas_call(
        kern,
        grid=(n0, n1, nos),
        in_specs=[*x_specs, w_dir_spec, *w_shift_specs],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((C, n0, n1, n2, P), x.dtype),
        interpret=interpret,
    )(*([xp] * len(kept_x)), W, *([W] * len(missing)))
    return y


def _kernel_pc(stencil, n2, kept_xidx, *refs):
    """Pencil-contiguous full-stencil kernel: refs = (*x_refs, w_ref, y_ref)
    with w_ref a SINGLE (1, 1, O, C, C, n2, P) block - the whole pencil's
    stencil in one contiguous DMA (measured: the slot-major layout's 45
    strided ~15 KB chunks per pencil held the apply at ~380 GB/s effective;
    one ~2.3 MB contiguous block per program reaches near-peak HBM)."""
    n_x = len(kept_xidx)
    x_refs = refs[:n_x]
    w_ref = refs[n_x]
    y_ref = refs[n_x + 1]
    xpos = {k: i for i, k in enumerate(kept_xidx)}
    C = y_ref.shape[0]

    acc = [None] * C
    for oi, o in enumerate(stencil):
        o0, o1, o2 = (int(v) for v in o)
        xr = x_refs[xpos[(o0 + 1, o1 + 1)]]
        for d in range(C):
            xs = xr[d, 0, 0, pl.ds(1 + o2, n2), :]  # (n2, P)
            for c in range(C):
                w = w_ref[0, 0, oi, c, d].astype(xs.dtype)
                t = w * xs
                acc[c] = t if acc[c] is None else acc[c] + t
    for c in range(C):
        y_ref[c, 0, 0] = acc[c]


def _kernel_pc_b(stencil, n2, kept_xidx, *refs):
    """Batched twin of _kernel_pc: x/y blocks carry a leading size-1 batch
    axis; the grid's innermost dimension iterates lanes with the W block's
    index map IGNORING it, so Mosaic keeps the (multi-MB) W block resident
    in VMEM across all B lanes - W streams from HBM once per pencil instead
    of once per (pencil, lane).  This is the multi-rhs amortization the
    x-update's (1+m) simultaneous solves need (jax.vmap of the plain
    kernel re-streams W per lane: measured 3.9x a single V-cycle at B=5)."""
    n_x = len(kept_xidx)
    x_refs = refs[:n_x]
    w_ref = refs[n_x]
    y_ref = refs[n_x + 1]
    xpos = {k: i for i, k in enumerate(kept_xidx)}
    C = y_ref.shape[1]

    acc = [None] * C
    for oi, o in enumerate(stencil):
        o0, o1, o2 = (int(v) for v in o)
        xr = x_refs[xpos[(o0 + 1, o1 + 1)]]
        for d in range(C):
            xs = xr[0, d, 0, 0, pl.ds(1 + o2, n2), :]  # (n2, P)
            for c in range(C):
                w = w_ref[0, 0, oi, c, d].astype(xs.dtype)
                t = w * xs
                acc[c] = t if acc[c] is None else acc[c] + t
    for c in range(C):
        y_ref[0, c, 0, 0] = acc[c]


@functools.partial(jax.jit, static_argnums=(0, 3))
def _apply_w_pallas_3d_pc_batched(stencil, W_pc, xb, interpret=False):
    """Batched pencil apply: xb (B, C, n0, n1, n2, P) -> (B, C, n0, n1,
    n2, P), W_pc as in _apply_w_pallas_3d_pc.  Grid (n0, n1, B) with B
    innermost; see _kernel_pc_b."""
    n0, n1, O, C, _, n2, P = W_pc.shape
    B = xb.shape[0]
    xp = jnp.pad(xb, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    kept = sorted({(int(o[0]) + 1, int(o[1]) + 1) for o in stencil})
    x_specs = [
        pl.BlockSpec(
            (1, C, 1, 1, n2 + 2, P),
            functools.partial(
                lambda di, dj, i, j, b: (b, 0, i + di, j + dj, 0, 0), di, dj
            ),
        )
        for (di, dj) in kept
    ]
    w_spec = pl.BlockSpec(
        (1, 1, O, C, C, n2, P), lambda i, j, b: (i, j, 0, 0, 0, 0, 0)
    )
    y_spec = pl.BlockSpec((1, C, 1, 1, n2, P), lambda i, j, b: (b, 0, i, j, 0, 0))
    kern = functools.partial(_kernel_pc_b, stencil, n2, tuple(kept))
    return pl.pallas_call(
        kern,
        grid=(n0, n1, B),
        in_specs=[*x_specs, w_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, n0, n1, n2, P), xb.dtype),
        interpret=interpret,
    )(*([xp] * len(kept)), W_pc)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _apply_w_pallas_3d_pc(stencil, W_pc, x, interpret=False):
    """W_pc: (n0, n1, O, C, C, n2, P) pencil-major full stencil (see
    to_pencil_major).  W_pc may be bf16 with f32 x: weights are upcast in
    registers, halving the dominant HBM stream - used for the V-cycle
    smoother applies where bf16 weight rounding only perturbs the
    preconditioner."""
    n0, n1, O, C, _, n2, P = W_pc.shape
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    kept = sorted({(int(o[0]) + 1, int(o[1]) + 1) for o in stencil})
    x_specs = [
        pl.BlockSpec(
            (C, 1, 1, n2 + 2, P),
            functools.partial(lambda di, dj, i, j: (0, i + di, j + dj, 0, 0), di, dj),
        )
        for (di, dj) in kept
    ]
    w_spec = pl.BlockSpec((1, 1, O, C, C, n2, P), lambda i, j: (i, j, 0, 0, 0, 0, 0))
    y_spec = pl.BlockSpec((C, 1, 1, n2, P), lambda i, j: (0, i, j, 0, 0))
    kern = functools.partial(_kernel_pc, stencil, n2, tuple(kept))
    return pl.pallas_call(
        kern,
        grid=(n0, n1),
        in_specs=[*x_specs, w_spec],
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((C, n0, n1, n2, P), x.dtype),
        interpret=interpret,
    )(*([xp] * len(kept)), W_pc)


def to_pencil_major(ps, W, dtype=None):
    """(O|H, C, C, n0, n1, n2, P) slot-major (full or symmetric-half) ->
    (n0, n1, O, C, C, n2, P) pencil-major full stencil, expanding sym
    storage on the fly, one output slot at a time (the transient is a
    single slot block ~W_sym/8, vs ~3 full-W copies for a monolithic
    expand+transpose - ROADMAP: the expand alone OOMed at 3D refs=5).

    Sym expansion identity: W[mu, c, d, s] = W[-mu, d, c, s + mu]
    (operator symmetry), realized as a global roll by -mu; the wrapped
    entries land exactly where x is read outside the lattice, which the
    apply's zero halo annihilates (same argument as _kernel_sym's edge
    clamping)."""
    O_full = len(ps.stencil)
    sym = W.shape[0] != O_full
    dtype = dtype or W.dtype
    stencil = [tuple(int(v) for v in o) for o in ps.stencil]
    if sym:
        from .patchstencil import half_slots

        half = list(half_slots(ps))
        pos = {h: i for i, h in enumerate(half)}
        neg = {oi: stencil.index(tuple(-v for v in o)) for oi, o in enumerate(stencil)}
    _, C, _, n0, n1, n2, P = W.shape
    out = jnp.zeros((n0, n1, O_full, C, C, n2, P), dtype)
    for oi, o in enumerate(stencil):
        if not sym:
            blk = W[oi]
        elif oi in pos:
            blk = W[pos[oi]]
        else:
            pair = W[pos[neg[oi]]]  # (C, C, n0, n1, n2, P)
            pt = jnp.swapaxes(pair, 0, 1)
            blk = jnp.roll(pt, shift=tuple(-int(v) for v in o), axis=(2, 3, 4))
        out = out.at[:, :, oi].set(
            jnp.transpose(blk, (2, 3, 0, 1, 4, 5)).astype(dtype)
        )
    return out


def transpose_pc(stencil, W_pc):
    """Exact transpose of the pc-layout stencil operator: W'[s, o, d, c] =
    W[s+o, -o, c, d] (global linear-algebra transpose of the per-patch
    apply; wrapped roll entries only ever multiply the apply's zero x-halo,
    the to_pencil_major argument).  Used by apply_w_pc's custom vjp so the
    Pallas kernel is reverse-mode differentiable in x - jax.vjp through
    the adjoint NS preconditioner (solvers.ns_solver.transpose_M) needs
    exactly this transposed application."""
    stencil = [tuple(int(v) for v in o) for o in stencil]
    neg = {oi: stencil.index(tuple(-v for v in o)) for oi, o in enumerate(stencil)}
    blocks = []
    for oi, o in enumerate(stencil):
        pair = W_pc[:, :, neg[oi]]  # (n0, n1, C, C, n2, P)
        pt = jnp.swapaxes(pair, 2, 3)
        pt = jnp.roll(pt, shift=tuple(-int(v) for v in o), axis=(0, 1, 4))
        blocks.append(pt)
    return jnp.stack(blocks, axis=2)


def apply_w_pc(ps, W_pc, x):
    stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
    # interpret mode keeps the pc layout usable off-TPU (tests); production
    # pc storage is only built on the TPU backend (patch_mg.assemble)
    interp = jax.default_backend() != "tpu"

    # custom vjp in x: Pallas kernels carry no AD rule, but the apply is
    # linear, so the backward pass is one application of the transposed
    # stencil.  W_pc is closed over: differentiating w.r.t. the stencil
    # raises (custom_vjp closure), which is the honest behavior - the
    # consumers differentiate in x only (transpose_M).
    @jax.custom_vjp
    def f(xx):
        return _apply_w_pallas_3d_pc(stencil, W_pc, xx, interpret=interp)

    def fwd(xx):
        return f(xx), None

    def bwd(_, g):
        Wt = transpose_pc(stencil, W_pc)
        return (_apply_w_pallas_3d_pc(stencil, Wt, g, interpret=interp),)

    f.defvjp(fwd, bwd)
    return f(x)


def _eft_two_sum(a, b):
    """Knuth two-sum inside the kernel.  Mosaic lowers these through MLIR
    arith ops with no algebraic simplification and no licensed FMA
    contraction of pure adds, so the EFT identities survive without the
    optimization barriers the XLA path needs (ops.df._ob)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _eft_two_prod(a, b):
    """Dekker/Veltkamp two-prod (f32 split constant 2^12+1).  FMA
    contraction inside the error expression is harmless: fma(ah,bh,-p) IS
    the exact error term (see ops.df.two_prod)."""
    p = a * b
    ca = a * 4097.0
    ah = ca - (ca - a)
    al = a - ah
    cb = b * 4097.0
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _kernel_sym_df(stencil, kept, missing, nsl, n2, kept_xidx, *refs):
    """Double-float sym-stencil apply: the EFT accumulation of
    patchstencil._apply_w_df_sym fused into the pencil kernel.  refs =
    (*xh_refs, *xl_refs, w_dir_ref, *w_shift_refs, yh_ref, yl_ref).

    The (hi, lo) accumulator pair lives in the revisited output blocks;
    each slot folds its exact product into it with two_sum.  The final
    grid step renormalizes the pair (two_sum of hi and lo), matching the
    XLA path's closing normalization."""
    n_x = len(kept_xidx)
    xh_refs = refs[:n_x]
    xl_refs = refs[n_x : 2 * n_x]
    w_dir = refs[2 * n_x]
    w_shift = refs[2 * n_x + 1 : 2 * n_x + 1 + len(missing)]
    yh_ref = refs[-2]
    yl_ref = refs[-1]
    xpos = {k: i for i, k in enumerate(kept_xidx)}
    os_ = pl.program_id(2)
    nos = pl.num_programs(2)
    C = yh_ref.shape[0]

    @pl.when(os_ == 0)
    def _init():
        yh_ref[...] = jnp.zeros_like(yh_ref)
        yl_ref[...] = jnp.zeros_like(yl_ref)

    def fold(c, w, xsh, xsl):
        p, e = _eft_two_prod(w, xsh)
        lo = e + w * xsl
        s, t = _eft_two_sum(yh_ref[c, 0, 0], p)
        yh_ref[c, 0, 0] = s
        yl_ref[c, 0, 0] += t + lo

    for h, slot_idx in enumerate(kept):
        chunk = h // nsl

        @pl.when(os_ == chunk)
        def _direct(h=h, slot_idx=slot_idx, chunk=chunk):
            o0, o1, o2 = (int(v) for v in stencil[slot_idx])
            xi = xpos[(o0 + 1, o1 + 1)]
            for d in range(C):
                xsh = xh_refs[xi][d, 0, 0, pl.ds(1 + o2, n2), :]
                xsl = xl_refs[xi][d, 0, 0, pl.ds(1 + o2, n2), :]
                for c in range(C):
                    fold(c, w_dir[h - chunk * nsl, c, d, 0, 0], xsh, xsl)

    n_chunks = -(-len(kept) // nsl)
    for t_i, (oi, _pair) in enumerate(missing):

        @pl.when(os_ == (t_i % n_chunks))
        def _transpose(t_i=t_i, oi=oi):
            o0, o1, o2 = (int(v) for v in stencil[oi])
            xi = xpos[(o0 + 1, o1 + 1)]
            for d in range(C):
                xsh = xh_refs[xi][d, 0, 0, pl.ds(1 + o2, n2), :]
                xsl = xl_refs[xi][d, 0, 0, pl.ds(1 + o2, n2), :]
                for c in range(C):
                    w = w_shift[t_i][0, d, c, 0, 0]  # (n2, P), note (d, c)
                    # row shift by o2 (zero-fill: x's zero halo annihilates
                    # out-of-lattice terms; shifting W rounds nothing)
                    if o2 == 1:
                        w = jnp.concatenate(
                            [w[1:, :], jnp.zeros_like(w[:1, :])], axis=0
                        )
                    elif o2 == -1:
                        w = jnp.concatenate(
                            [jnp.zeros_like(w[:1, :]), w[: n2 - 1, :]], axis=0
                        )
                    fold(c, w, xsh, xsl)

    @pl.when(os_ == nos - 1)
    def _renorm():
        for c in range(C):
            s, e = _eft_two_sum(yh_ref[c, 0, 0], yl_ref[c, 0, 0])
            yh_ref[c, 0, 0] = s
            yl_ref[c, 0, 0] = e


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 6))
def _apply_w_df_pallas_3d_sym(stencil, kept, nsl, W, xh, xl, interpret=False):
    """Double-float sym-stencil apply as one Pallas pass: streams W once
    (vs the XLA EFT chain's rematerialized full-lattice temporaries -
    measured 35x a plain apply at 3D refs=4) and never needs the
    row-chunked barrier path (_apply_w_df_rows): the EFT temporaries live
    in registers/VMEM per pencil."""
    H, C, _, n0, n1, n2, P = W.shape
    pad = [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)]
    xhp = jnp.pad(xh, pad)
    xlp = jnp.pad(xl, pad)
    kept_x = sorted({(int(o[0]) + 1, int(o[1]) + 1) for o in stencil})
    pos = {k: i for i, k in enumerate(kept)}
    neg = {}
    for oi, o in enumerate(stencil):
        neg[oi] = stencil.index(tuple(-v for v in o))
    missing = tuple(
        (oi, pos[neg[oi]]) for oi in range(len(stencil)) if oi not in pos
    )
    nos = -(-H // nsl)
    if nos * nsl != H:
        padn = nos * nsl - H
        W = jnp.concatenate([W, jnp.zeros((padn,) + W.shape[1:], W.dtype)], 0)
        kept = tuple(kept) + tuple(kept[:1]) * padn  # zero weights: harmless

    x_specs = [
        pl.BlockSpec(
            (C, 1, 1, n2 + 2, P),
            functools.partial(
                lambda di, dj, i, j, s: (0, i + di, j + dj, 0, 0), di, dj
            ),
        )
        for (di, dj) in kept_x
    ]
    w_dir_spec = pl.BlockSpec(
        (nsl, C, C, 1, 1, n2, P), lambda i, j, s: (s, 0, 0, i, j, 0, 0)
    )

    def _shift_map(o0, o1, pair, i, j, s):
        ii = jnp.clip(i + o0, 0, n0 - 1)
        jj = jnp.clip(j + o1, 0, n1 - 1)
        return (pair, 0, 0, ii, jj, 0, 0)

    w_shift_specs = [
        pl.BlockSpec(
            (1, C, C, 1, 1, n2, P),
            functools.partial(
                _shift_map,
                int(stencil[oi][0]),
                int(stencil[oi][1]),
                pair,
            ),
        )
        for (oi, pair) in missing
    ]
    y_spec = pl.BlockSpec((C, 1, 1, n2, P), lambda i, j, s: (0, i, j, 0, 0))

    kern = functools.partial(
        _kernel_sym_df, stencil, tuple(kept), missing, nsl, n2, tuple(kept_x)
    )
    yh, yl = pl.pallas_call(
        kern,
        grid=(n0, n1, nos),
        in_specs=[*(x_specs * 2), w_dir_spec, *w_shift_specs],
        out_specs=(y_spec, y_spec),
        out_shape=(
            jax.ShapeDtypeStruct((C, n0, n1, n2, P), xh.dtype),
            jax.ShapeDtypeStruct((C, n0, n1, n2, P), xh.dtype),
        ),
        interpret=interpret,
    )(*([xhp] * len(kept_x)), *([xlp] * len(kept_x)), W, *([W] * len(missing)))
    return yh, yl


def apply_w_df_pallas(ps, W, xh, xl, slot_chunk: int | None = None):
    """Drop-in for patchstencil's DF apply on 3D symmetric-half W."""
    from .patchstencil import half_slots

    stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
    kept = tuple(half_slots(ps))
    return _apply_w_df_pallas_3d_sym(
        stencil, kept, slot_chunk or _DF_SLOT_CHUNK, W, xh, xl
    )


def usable_df(ps, W, x) -> bool:
    """DF-kernel applicability: the sym-storage 3D case the mixed-precision
    deformation solve uses (full-stencil DF stays on the XLA path)."""
    if not ENABLED or ps.dim != 3:
        return False
    if W.ndim != 7 or W.dtype != x.dtype:
        return False
    if x.dtype != jnp.float32:  # Dekker split constant is f32-specific
        return False
    from .patchstencil import half_slots

    if W.shape[0] != len(half_slots(ps)):  # sym storage only
        return False
    if x.shape[1] < 16:
        return False
    return jax.default_backend() == "tpu"


def apply_w_pallas(ps, W, x, slot_chunk: int | None = None):
    """Drop-in for patchstencil.apply_w on 3D slot-major W (full stencil
    or symmetric half-stencil, detected by the slot count)."""
    stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
    if W.shape[0] == len(ps.stencil):
        return _apply_w_pallas_3d(stencil, slot_chunk or _SLOT_CHUNK, W, x)
    from .patchstencil import half_slots

    kept = tuple(half_slots(ps))
    return _apply_w_pallas_3d_sym(
        stencil, kept, slot_chunk or _SYM_SLOT_CHUNK, W, x
    )


def usable(ps, W, x) -> bool:
    """Kernel applicability: 3D, slot-major stencil W, big enough lattice
    for the pencil grid to amortize, TPU backend."""
    if not ENABLED or ps.dim != 3:
        return False
    if W.ndim != 7 or W.dtype != x.dtype:
        return False
    if x.shape[1] < 16:  # tiny levels: XLA path is faster than grid overhead
        return False
    return jax.default_backend() == "tpu"
