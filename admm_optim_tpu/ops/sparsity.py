"""Block-ELL sparse operators with precomputed FE assembly maps.

TPU-native replacement for UG4's CPU sparse matrices behind
``AssembledLinearOperator`` (reference 2d_admm.lua:331,478).

**Layout: structure-of-arrays, big axis LAST.**  TPU tiles the last two
dimensions of every materialized buffer to (8, 128) for f32; arrays shaped
``(N, K, C, C)`` pad their trailing (C, C)=(3, 3) to (8, 128) - a 56x memory
blowup (observed: 400 MB of 3D element matrices ballooning to 22.5 GB of
HBM).  All persistent operator data therefore keeps the row axis N (or
element axis E) in the minor-most position:

 * ``cols  (K, N)``      padded neighbor table (ELL), padded with the row
   index itself so gathers stay in-bounds and padded values of 0 are no-ops
 * ``vals  (C, C, K, N)`` block values; trailing (K, N) pads K to 8 and N to
   128 - bounded <= 1.5x waste
 * fields at the solver level are FLAT component-major vectors
   ``x (C*N,) == X(C, N).ravel()``; spmv reshapes (free, layout-compatible)

The assembly scatter map sends element-local matrix entries (ordered
(i, j, e), e minor) to k-major flat slots ``k*N + n`` so the segment_sum
output reshapes to (K, N) without a copy.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Pattern:
    """Static (host) part of a block-ELL operator."""

    n_rows: int
    block: int  # block size C (components per row)
    cols: np.ndarray  # (K, N) int32
    slots: np.ndarray  # (nl*nl*E,) int32 flat k-major index into (K*N)
    diag_k: np.ndarray  # (N,) int32: k position of the diagonal in each row
    nl: int  # local dofs per element

    @property
    def K(self) -> int:
        return self.cols.shape[0]

    @property
    def n_flat(self) -> int:
        return self.n_rows * self.block


def build_pattern(elem_dofs: np.ndarray, n_rows: int, block: int) -> Pattern:
    """elem_dofs: (E, nl) int. Builds the ELL pattern + assembly scatter map.

    The scatter map is ordered (i, j, e) with e minor-most, matching element
    matrices laid out (C, C, nl, nl, E).  Uses the native meshkit runtime
    (native/meshkit.cpp) when available; numpy otherwise (same contract)."""
    E, nl = elem_dofs.shape
    from ..core import meshkit

    native = meshkit.pattern(elem_dofs, n_rows)
    if native is not None:
        cols, slots, diag_k = native
        return Pattern(
            n_rows=n_rows, block=block, cols=cols, slots=slots, diag_k=diag_k, nl=nl
        )
    # entry (i, j, e): row = dofs[e,i], col = dofs[e,j]; e minor
    rows = elem_dofs.T[:, None, :].repeat(nl, 1).ravel().astype(np.int64)  # (nl,nl,E)
    cols = elem_dofs.T[None, :, :].repeat(nl, 0).ravel().astype(np.int64)
    key = rows * n_rows + cols
    uniq = np.unique(key)
    diag_keys = np.arange(n_rows, dtype=np.int64) * n_rows + np.arange(n_rows)
    uniq = np.unique(np.concatenate([uniq, diag_keys]))
    urow = uniq // n_rows
    row_start = np.searchsorted(urow, np.arange(n_rows))
    pos_in_row = np.arange(len(uniq)) - row_start[urow]
    counts = np.bincount(urow, minlength=n_rows)
    K = int(counts.max())
    cols_pad = np.tile(np.arange(n_rows, dtype=np.int64)[None, :], (K, 1))  # (K, N)
    cols_pad[pos_in_row, urow] = uniq % n_rows
    uslot = pos_in_row * n_rows + urow  # k-major flat slot
    idx = np.searchsorted(uniq, key)
    slots = uslot[idx]
    dpos = np.searchsorted(uniq, diag_keys)
    diag_k = pos_in_row[dpos]
    return Pattern(
        n_rows=n_rows,
        block=block,
        cols=cols_pad.astype(np.int32),
        slots=slots.astype(np.int32),
        diag_k=diag_k.astype(np.int32),
        nl=nl,
    )


def assemble_values(pat: Pattern, elem_mats: jnp.ndarray) -> jnp.ndarray:
    """elem_mats: (C, C, nl, nl, E) -> vals (C, C, K, N).

    Convention: ``elem_mats[c, d, i, j, e]`` couples test dof (i, c) with
    trial dof (j, d) of element e."""
    C = pat.block
    E = elem_mats.shape[-1]
    flat = elem_mats.reshape(C * C, pat.nl * pat.nl * E)
    slots = jnp.asarray(pat.slots)

    def seg(v):
        return jax.ops.segment_sum(v, slots, num_segments=pat.n_rows * pat.K)

    out = jax.vmap(seg)(flat)  # (C*C, K*N), k-major
    return out.reshape(C, C, pat.K, pat.n_rows)


def bake_dirichlet(pat: Pattern, vals: jnp.ndarray, fixed: jnp.ndarray) -> jnp.ndarray:
    """Impose homogeneous Dirichlet rows/cols symmetrically.

    fixed: (C, N) bool.  Zeroes constrained rows and columns and puts 1 on
    the diagonal, mirroring DirichletBoundary + adjust_solution in the
    reference (2d_admm.lua:240-258, 476)."""
    C, _, K, N = vals.shape
    cols = jnp.asarray(pat.cols)  # (K, N)
    row_fix = fixed[:, None, None, :]  # (C,1,1,N) test component c fixed
    col_fix = fixed[:, cols][None, :, :, :]  # (1,C,K,N) trial component d fixed
    vals = jnp.where(row_fix | col_fix, 0.0, vals)
    # unit diagonal at fixed dofs: vals[c, c, diag_k[n], n] = 1
    diag_k = jnp.asarray(pat.diag_k)  # (N,)
    onehot_k = diag_k[None, :] == jnp.arange(K)[:, None]  # (K, N)
    eye = jnp.eye(C, dtype=vals.dtype)[:, :, None, None]  # (C,C,1,1)
    fix_cd = (fixed[:, None, :] | fixed[None, :, :])[:, :, None, :]  # (C,C,1,N)
    vals = jnp.where(onehot_k[None, None] & fix_cd, eye, vals)
    return vals


def spmv_cn(pat: Pattern, vals: jnp.ndarray, x_cn: jnp.ndarray) -> jnp.ndarray:
    """y (C,N) = A @ x with x (C,N)."""
    cols = jnp.asarray(pat.cols)  # (K, N)
    xg = x_cn[:, cols]  # (C, K, N)
    return jnp.einsum("cdkn,dkn->cn", vals, xg)


def spmv_flat(pat: Pattern, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y (C*N,) = A @ x (C*N,), component-major flat layout."""
    C, N = pat.block, pat.n_rows
    return spmv_cn(pat, vals, x.reshape(C, N)).reshape(-1)


def spmv(pat: Pattern, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Compatibility wrapper: x (N, C) -> y (N, C)."""
    return spmv_cn(pat, vals, x.T).T


def diag_cn(pat: Pattern, vals: jnp.ndarray) -> jnp.ndarray:
    """(C, N) scalar diagonal."""
    C, _, K, N = vals.shape
    diag_k = jnp.asarray(pat.diag_k)
    onehot_k = (diag_k[None, :] == jnp.arange(K)[:, None]).astype(vals.dtype)
    dblocks = jnp.einsum("cdkn,kn->cdn", vals, onehot_k)  # (C,C,N)
    return dblocks[jnp.arange(C), jnp.arange(C), :]  # (C, N)


def to_dense(pat: Pattern, vals: jnp.ndarray) -> jnp.ndarray:
    """Densify to (C*N, C*N) in component-major flat ordering (for the
    coarse-level direct solve; replaces SuperLU, obstacle_optim_util.lua:22).
    """
    C, _, K, N = vals.shape
    cols = jnp.asarray(pat.cols)
    dense = jnp.zeros((C, N, C, N), dtype=vals.dtype)
    rows = jnp.arange(N)
    for k in range(K):
        # dense[c, n, d, cols[k,n]] += vals[c,d,k,n]
        dense = dense.at[:, rows, :, cols[k]].add(
            jnp.moveaxis(vals[:, :, k, :], -1, 0)  # (N, C, C)
        )
    return dense.reshape(C * N, C * N)


# ---- explicit transpose ---------------------------------------------------
#
# The adjoint NS solve preconditions J^T with the transpose of the forward
# block preconditioner (solvers.ns_solver.transpose_M).  jax.vjp transposes
# the gather-based spmv into a SCATTER-add - measured slow on TPU regardless
# of index structure (docs/ROADMAP.md item 4c) - so the reverse sweep of a
# V-cycle costs several times the forward cycle.  The fix: precompute the
# within-pattern permutation that maps vals -> vals of A^T (ELL patterns
# built from element connectivity are structurally symmetric), and give the
# spmv a custom linear-transpose rule that applies the pre-transposed values
# with the SAME gather-based kernel.  jax.vjp of any closure over the
# operator then stays exact while never emitting a scatter.


def transpose_map(pat: Pattern):
    """Host-precomputed mapping for in-pattern transposition.

    Returns (k_src (K, N) int32, n_src (K, N) int32, valid (K, N) bool):
    ``vals_T[c, d, k, n] = vals[d, c, k_src, n_src]`` where valid, 0 on the
    padding slots.  Requires the pattern to be structurally symmetric -
    guaranteed for patterns built from element dof lists (every (i, j)
    pairing appears with its (j, i) partner)."""
    cols = np.asarray(pat.cols, dtype=np.int64)  # (K, N)
    K, N = cols.shape
    diag_k = np.asarray(pat.diag_k, dtype=np.int64)
    nn = np.broadcast_to(np.arange(N, dtype=np.int64)[None, :], (K, N))
    kk = np.broadcast_to(np.arange(K, dtype=np.int64)[:, None], (K, N))
    valid = (cols != nn) | (kk == diag_k[None, :])
    # real-slot lookup sorted by (row * N + col)
    rows_r = nn[valid]
    cols_r = cols[valid]
    k_r = kk[valid]
    skey = rows_r * N + cols_r
    order = np.argsort(skey)
    skey_s = skey[order]
    k_s = k_r[order]
    # query: transpose of slot (k, n) lives at row cols[k, n], col n
    tkey = cols * N + nn
    idx = np.searchsorted(skey_s, tkey.ravel()).reshape(K, N)
    idx = np.clip(idx, 0, len(skey_s) - 1)
    found = skey_s[idx] == tkey
    if not np.all(found[valid]):
        raise ValueError("pattern is not structurally symmetric")
    k_src = np.where(valid, k_s[idx], 0)
    n_src = np.where(valid, cols, 0)
    return (
        k_src.astype(np.int32),
        n_src.astype(np.int32),
        valid,
    )


def transpose_values(pat: Pattern, vals: jnp.ndarray, tmap=None) -> jnp.ndarray:
    """vals (C, C, K, N) of A -> values of A^T in the same pattern."""
    if tmap is None:
        tmap = transpose_map(pat)
    k_src, n_src, valid = tmap
    vT = jnp.swapaxes(vals, 0, 1)[:, :, jnp.asarray(k_src), jnp.asarray(n_src)]
    return jnp.where(jnp.asarray(valid)[None, None], vT, 0.0)


def spmv_flat_pair(pat: Pattern, vals, vals_t, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x with a custom linear-transpose rule: the cotangent pass runs
    the gather-based spmv on the pre-transposed values instead of XLA's
    scatter transposition of the forward gather.  Numerically identical to
    spmv_flat in both directions (the transpose is exact, not a surrogate).
    """
    from jax import custom_derivatives as _cd

    def fwd(res, xx):
        v, _ = res
        return spmv_flat(pat, v, xx)

    def trans(res, ct):
        _, vt = res
        return spmv_flat(pat, vt, ct)

    return _cd.linear_call(fwd, trans, (vals, vals_t), x)


# ---- field layout helpers -------------------------------------------------

def to_flat(u_vc: jnp.ndarray) -> jnp.ndarray:
    """(V, C) field -> flat component-major (C*V,)."""
    return u_vc.T.reshape(-1)


def from_flat(x: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """flat (C*V,) -> (V, C)."""
    return x.reshape(-1, n_rows).T
