"""Batched affine-simplex geometry kernels (JAX).

Everything the reference gets from UG4's element loops' reference-mapping
machinery, as dense batched tensor ops: per-element Jacobians, inverses,
volumes and P1 basis gradients, recomputed from *current* vertex coordinates
so a single compiled step handles all mesh deformations
(``TransformDomainByDisplacement``, 2d_admm.lua:1284).

**Layout: element axis LAST** (TPU lanes).  Per-element tensors are
``(d, d, E)``, basis gradients ``(nl, d, E)``; the (8, 128) f32 tiling then
pads only the small second-to-last dim (<= 2.7x on materialized buffers)
instead of the catastrophic 56-85x of element-leading layouts.

Field conventions used throughout the framework:
 * vertex/dof fields: ``(C, N)`` (component-major); solver-level vectors are
   the flat ``(C*N,)`` view
 * coordinates enter as ``(V, d)`` (host/mesh order) and are transposed once
   at kernel entry.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sdet(J):
    """det of (d, d, ...) stacked matrices."""
    d = J.shape[0]
    if d == 2:
        return J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
    return (
        J[0, 0] * (J[1, 1] * J[2, 2] - J[1, 2] * J[2, 1])
        - J[0, 1] * (J[1, 0] * J[2, 2] - J[1, 2] * J[2, 0])
        + J[0, 2] * (J[1, 0] * J[2, 1] - J[1, 1] * J[2, 0])
    )


def sinv(J, det):
    """inverse of (d, d, ...) stacked matrices given det."""
    d = J.shape[0]
    if d == 2:
        a, b, c, dd = J[0, 0], J[0, 1], J[1, 0], J[1, 1]
        adj = jnp.stack(
            [jnp.stack([dd, -b]), jnp.stack([-c, a])]
        )
        return adj / det

    def cof(i1, i2, j1, j2):
        return J[i1, j1] * J[i2, j2] - J[i1, j2] * J[i2, j1]

    adj = jnp.stack(
        [
            jnp.stack([cof(1, 2, 1, 2), -cof(0, 2, 1, 2), cof(0, 1, 1, 2)]),
            jnp.stack([-cof(1, 2, 0, 2), cof(0, 2, 0, 2), -cof(0, 1, 0, 2)]),
            jnp.stack([cof(1, 2, 0, 1), -cof(0, 2, 0, 1), cof(0, 1, 0, 1)]),
        ]
    )
    return adj / det


def gather_elem(coords: jnp.ndarray, elems: jnp.ndarray) -> jnp.ndarray:
    """coords (V, d), elems (E, nl) -> element corner positions (d, nl, E)."""
    return coords.T[:, elems.T]


def elem_geometry(coords, elems):
    """-> (J (d,d,E), detJ (E,), Jinv (d,d,E), vol (E,)).

    J columns are the simplex edge vectors x_i - x_0.  ``detJ`` is SIGNED
    (element orientation is preserved through refinement so that brick/Kuhn
    lattice meshes keep a translation-invariant element-class structure —
    see core.patches); ``vol`` is the unsigned measure |detJ|/d!.  Inversion
    checks must compare sign(detJ) against the undeformed mesh."""
    d = coords.shape[1]
    x = gather_elem(coords, elems)  # (d, nl, E)
    J = x[:, 1:, :] - x[:, :1, :]  # (d, d, E): J[a, b] = edge vector b, comp a
    det = sdet(J)
    Jinv = sinv(J, det)
    vol = jnp.abs(det) / math.factorial(d)
    return J, det, Jinv, vol


def corner_geometry(x):
    """Geometry from explicit corner positions x (d, nl, ...): same outputs
    as elem_geometry but for any batch layout (used by the patch-stencil
    assembly where corners come from lattice slices, not index gathers)."""
    d = x.shape[0]
    J = x[:, 1:] - x[:, :1]
    det = sdet(J)
    Jinv = sinv(J, det)
    vol = jnp.abs(det) / math.factorial(d)
    return J, det, Jinv, vol


def p1_ref_grads(d: int) -> np.ndarray:
    g = np.zeros((d + 1, d))
    g[0] = -1.0
    g[1:] = np.eye(d)
    return g


def p1_phys_grads(Jinv):
    """Physical P1 basis gradients (nl, d, ...): g[b, :, ...] =
    g_ref[b, :] @ Jinv[:, :, ...] for any trailing batch layout.

    The reference gradients are rows of [-1; I], so the contraction is a
    sum + concat rather than an einsum: XLA lowers the (nl, d)x(d, d, ...)
    dot_general to an MXU matmul with the tiny dims as matrix dims, padding
    the batched temporaries ~3x (21.7G vs 7G observed at 3D refs=5)."""
    return jnp.concatenate([-Jinv.sum(0, keepdims=True), Jinv], axis=0)
