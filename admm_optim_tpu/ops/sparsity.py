"""Block-ELL sparse operators with precomputed FE assembly maps.

TPU-native replacement for UG4's CPU sparse matrices behind
``AssembledLinearOperator`` (reference 2d_admm.lua:331,478).  The sparsity
pattern of a fixed mesh topology never changes, so we precompute, per
(dof-map, pattern):

 * a padded neighbor table ``cols (N, K)`` (ELL format, padded with the row
   index itself so gathers stay in-bounds and padded values of 0 are no-ops),
 * a scatter map ``slots (E*nl*nl,)`` sending each element-local matrix entry
   to its flat position in ``vals (N*K)``,
 * the diagonal slot per row.

Per assembly we only ``segment_sum`` the freshly computed element matrices
into ``vals`` - a single fused scatter.  SpMV is a gather + batched small
matmul: ``y[n] = sum_k vals[n,k] @ x[cols[n,k]]`` which maps onto the
VPU/MXU with perfectly regular access.
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
    cols: np.ndarray  # (N, K) int32
    slots: np.ndarray  # (E*nl*nl,) int32 flat index into (N*K)
    diag_slot: np.ndarray  # (N,) int32 flat index of the diagonal entry
    nl: int  # local dofs per element

    @property
    def K(self) -> int:
        return self.cols.shape[1]


def build_pattern(elem_dofs: np.ndarray, n_rows: int, block: int) -> Pattern:
    """elem_dofs: (E, nl) int. Builds the ELL pattern + assembly scatter map."""
    E, nl = elem_dofs.shape
    rows = np.repeat(elem_dofs, nl, axis=1).ravel().astype(np.int64)  # (E*nl*nl,)
    cols = np.tile(elem_dofs, (1, nl)).ravel().astype(np.int64)
    key = rows * n_rows + cols
    uniq = np.unique(key)
    # also ensure the diagonal exists in every row (isolated rows)
    diag_keys = np.arange(n_rows, dtype=np.int64) * n_rows + np.arange(n_rows)
    uniq = np.unique(np.concatenate([uniq, diag_keys]))
    urow = uniq // n_rows
    # position within row
    row_start = np.searchsorted(urow, np.arange(n_rows))
    pos_in_row = np.arange(len(uniq)) - row_start[urow]
    counts = np.bincount(urow, minlength=n_rows)
    K = int(counts.max())
    cols_pad = np.tile(np.arange(n_rows, dtype=np.int64)[:, None], (1, K))
    cols_pad[urow, pos_in_row] = uniq % n_rows
    # flat slot of each unique entry
    uslot = urow * K + pos_in_row
    # map each element entry to its unique slot
    idx = np.searchsorted(uniq, key)
    slots = uslot[idx]
    dpos = np.searchsorted(uniq, diag_keys)
    diag_slot = uslot[dpos]
    return Pattern(
        n_rows=n_rows,
        block=block,
        cols=cols_pad.astype(np.int32),
        slots=slots.astype(np.int32),
        diag_slot=diag_slot.astype(np.int32),
        nl=nl,
    )


@partial(jax.jit, static_argnames=("n_rows", "K", "block"))
def _scatter_vals(elem_mats_flat, slots, n_rows, K, block):
    return jax.ops.segment_sum(
        elem_mats_flat, slots, num_segments=n_rows * K
    ).reshape(n_rows, K, block, block)


def assemble_values(pat: Pattern, elem_mats: jnp.ndarray) -> jnp.ndarray:
    """elem_mats: (E, nl, C, nl, C) -> vals (N, K, C, C).

    The element matrix convention: ``elem_mats[e, i, c, j, d]`` couples test
    dof (i, c) with trial dof (j, d).
    """
    C = pat.block
    flat = jnp.transpose(elem_mats, (0, 1, 3, 2, 4)).reshape(-1, C, C)
    slots = jnp.asarray(pat.slots)
    return _scatter_vals(flat, slots, pat.n_rows, pat.K, C)


def bake_dirichlet(pat: Pattern, vals: jnp.ndarray, fixed: jnp.ndarray) -> jnp.ndarray:
    """Impose homogeneous Dirichlet rows/cols symmetrically.

    fixed: (N, C) bool.  Zeroes constrained rows and columns and puts 1 on the
    diagonal, mirroring DirichletBoundary + adjust_solution in the reference
    (2d_admm.lua:240-258, 476).
    """
    cols = jnp.asarray(pat.cols)
    row_fix = fixed[:, None, :, None]  # (N,1,C,1)
    col_fix = fixed[cols][:, :, None, :]  # (N,K,1,C)
    vals = jnp.where(row_fix | col_fix, 0.0, vals)
    # unit diagonal at fixed dofs
    N, K, C, _ = vals.shape
    dr = jnp.asarray(pat.diag_slot) // K
    dk = jnp.asarray(pat.diag_slot) % K
    eye = jnp.eye(C, dtype=vals.dtype)
    sel = fixed[:, :, None] | fixed[:, None, :]
    new_diag = jnp.where(sel, eye[None], vals[dr, dk])
    vals = vals.at[dr, dk].set(new_diag)
    return vals


def spmv(pat: Pattern, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y (N,C) = A @ x (N,C)."""
    cols = jnp.asarray(pat.cols)
    xg = x[cols]  # (N, K, C)
    return jnp.einsum("nkcd,nkd->nc", vals, xg)


def diag_blocks(pat: Pattern, vals: jnp.ndarray) -> jnp.ndarray:
    """(N, C, C) diagonal blocks."""
    K = pat.K
    dr = jnp.asarray(pat.diag_slot) // K
    dk = jnp.asarray(pat.diag_slot) % K
    return vals[dr, dk]


def diag(pat: Pattern, vals: jnp.ndarray) -> jnp.ndarray:
    """(N, C) scalar diagonal."""
    db = diag_blocks(pat, vals)
    return jnp.diagonal(db, axis1=-2, axis2=-1)


def to_dense(pat: Pattern, vals: jnp.ndarray) -> jnp.ndarray:
    """Densify (for the coarse-level direct solve; replaces SuperLU,
    obstacle_optim_util.lua:22)."""
    N, K, C, _ = vals.shape
    cols = jnp.asarray(pat.cols)
    dense = jnp.zeros((N, C, N, C), dtype=vals.dtype)
    for k in range(K):
        dense = dense.at[jnp.arange(N), :, cols[:, k], :].add(vals[:, k])
    return dense.reshape(N * C, N * C)
