"""Batched affine-simplex geometry kernels (JAX).

Everything the reference gets from UG4's element loops' reference-mapping
machinery, as dense batched tensor ops: per-element Jacobians, inverses,
volumes and P1 basis gradients, recomputed from *current* vertex coordinates
so a single compiled step handles all mesh deformations
(``TransformDomainByDisplacement``, 2d_admm.lua:1284).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def det22(J):
    return J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]


def inv22(J, det):
    a, b = J[..., 0, 0], J[..., 0, 1]
    c, d = J[..., 1, 0], J[..., 1, 1]
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
    )
    return inv / det[..., None, None]


def det33(J):
    return (
        J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1])
        - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 0])
        + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0])
    )


def inv33(J, det):
    def cof(i1, i2, j1, j2):
        return J[..., i1, j1] * J[..., i2, j2] - J[..., i1, j2] * J[..., i2, j1]

    adj = jnp.stack(
        [
            jnp.stack([cof(1, 2, 1, 2), -cof(0, 2, 1, 2), cof(0, 1, 1, 2)], -1),
            jnp.stack([-cof(1, 2, 0, 2), cof(0, 2, 0, 2), -cof(0, 1, 0, 2)], -1),
            jnp.stack([cof(1, 2, 0, 1), -cof(0, 2, 0, 1), cof(0, 1, 0, 1)], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def sdet(J):
    return det22(J) if J.shape[-1] == 2 else det33(J)


def sinv(J, det):
    return inv22(J, det) if J.shape[-1] == 2 else inv33(J, det)


def elem_geometry(coords, elems):
    """coords (V,d), elems (E,d+1) -> (J (E,d,d), detJ (E,), Jinv (E,d,d), vol (E,))

    J columns are the simplex edge vectors x_i - x_0; elements are kept
    positively oriented by core.mesh, so detJ > 0 on the undeformed mesh.
    """
    d = coords.shape[1]
    x = coords[elems]  # (E, d+1, d)
    J = jnp.swapaxes(x[:, 1:, :] - x[:, :1, :], 1, 2)  # (E, d, d)
    det = sdet(J)
    Jinv = sinv(J, det)
    vol = det / math.factorial(d)
    return J, det, Jinv, vol


def p1_ref_grads(d: int) -> np.ndarray:
    g = np.zeros((d + 1, d))
    g[0] = -1.0
    g[1:] = np.eye(d)
    return g


def p1_phys_grads(Jinv):
    """Physical P1 basis gradients (E, d+1, d): dl @ Jinv^T?  We have
    grad_x phi = Jinv^T @ grad_xi phi; with row-vector convention:
    g_phys[b,:] = g_ref[b,:] @ Jinv."""
    d = Jinv.shape[-1]
    dl = jnp.asarray(p1_ref_grads(d), dtype=Jinv.dtype)
    return jnp.einsum("br,erd->ebd", dl, Jinv)
