"""Operator layer: block-ELL assembly/SpMV, deformation element matrices,
constraint functionals (AD-consistency), prox projections."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import refine
from admm_optim_tpu.ops import deformation as dfm
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.geometry import elem_geometry


@pytest.fixture(scope="module")
def mesh2d():
    return geomgen.channel_2d()


def test_spmv_matches_dense(mesh2d):
    lvl = mesh2d
    rng = np.random.default_rng(0)
    E, nl = lvl.elems.shape
    C = 2
    pat = sparsity.build_pattern(lvl.elems, lvl.num_vertices, C)
    em = rng.normal(size=(E, nl, C, nl, C))
    vals = sparsity.assemble_values(pat, jnp.asarray(em))
    x = rng.normal(size=(lvl.num_vertices, C))
    y = sparsity.spmv(pat, vals, jnp.asarray(x))
    # dense reference
    A = np.zeros((lvl.num_vertices * C, lvl.num_vertices * C))
    for e in range(E):
        for i in range(nl):
            for j in range(nl):
                gi, gj = lvl.elems[e, i], lvl.elems[e, j]
                A[gi * C : gi * C + C, gj * C : gj * C + C] += em[e, i, :, j, :]
    np.testing.assert_allclose(np.asarray(y).ravel(), A @ x.ravel(), rtol=1e-10)
    # densify path agrees too
    D = np.asarray(sparsity.to_dense(pat, vals))
    np.testing.assert_allclose(D, A, atol=1e-10)


def test_deformation_energy_analytic(mesh2d):
    lvl = mesh2d
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    c_eps, c_grad, c_mass = 1.3, 0.7, 0.4
    A = dfm.deformation_elem_mats(coords, elems, c_eps, c_grad, c_mass)
    pat = sparsity.build_pattern(lvl.elems, lvl.num_vertices, 2)
    vals = sparsity.assemble_values(pat, A)
    M = jnp.asarray([[0.3, -0.2], [0.5, 0.1]])
    u = coords @ M.T  # u = M x, exactly P1
    energy = 0.5 * jnp.vdot(u, sparsity.spmv(pat, vals, u))
    _, _, _, vol = elem_geometry(coords, elems)
    V = float(vol.sum())
    symM = 0.5 * (M + M.T)
    # independent quadrature of the mass term: degree-2 rule per element
    from admm_optim_tpu.core.quadrature import simplex_rule

    bary, w = simplex_rule(2, 2)
    xq = jnp.einsum("qb,ebd->eqd", jnp.asarray(bary), coords[elems])
    uq = xq @ M.T
    mass_term = jnp.einsum("e,q,eqd,eqd->", vol, jnp.asarray(w), uq, uq)
    expected = 0.5 * (
        c_eps * float(jnp.sum(symM * symM)) * V
        + c_grad * float(jnp.sum(M * M)) * V
        + c_mass * float(mass_term)
    )
    assert float(energy) == pytest.approx(expected, rel=1e-10)


def test_constraints_closed_form(mesh2d):
    lvl = mesh2d
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    _, _, _, vol = elem_geometry(coords, elems)
    V = float(vol.sum())
    z = jnp.zeros_like(coords)
    assert float(dfm.volume_defect(coords, elems, z, V)) == pytest.approx(0.0, abs=1e-10)
    # uniform dilation u = a*x: det(I+aI) = (1+a)^2
    a = 0.07
    gv = dfm.volume_defect(coords, elems, a * coords, V)
    assert float(gv) == pytest.approx(((1 + a) ** 2 - 1) * V, rel=1e-10)
    # translation u = c: barycenter shifts by c*V (unnormalized)
    c = jnp.asarray([0.3, -0.4])
    b0 = dfm.barycenter(coords, elems, z)
    b1 = dfm.barycenter(coords, elems, jnp.broadcast_to(c, coords.shape))
    np.testing.assert_allclose(np.asarray(b1 - b0), np.asarray(c) * V, rtol=1e-10)


def test_constraint_grads_match_fd(mesh2d):
    lvl = mesh2d
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    _, _, _, vol = elem_geometry(coords, elems)
    V = float(vol.sum())
    b0 = dfm.barycenter(coords, elems, jnp.zeros_like(coords))
    rng = np.random.default_rng(1)
    u = jnp.asarray(0.01 * rng.normal(size=coords.shape))
    du = jnp.asarray(rng.normal(size=coords.shape))
    free = jnp.ones(coords.shape)
    B = dfm.constraint_grads(coords, elems, u, V, b0, free)
    eps = 1e-6
    gp = dfm.constraints(coords, elems, u + eps * du, V, b0)
    gm = dfm.constraints(coords, elems, u - eps * du, V, b0)
    fd = (gp - gm) / (2 * eps)
    ad = jnp.einsum("mvc,vc->m", B, du)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(fd), rtol=1e-6, atol=1e-8)


def test_prox_projections():
    rng = np.random.default_rng(2)
    Q = jnp.asarray(rng.normal(size=(50, 2, 2)))
    sigma = 0.8
    Pf = dfm.project_frobenius(Q, sigma)
    nrm = np.sqrt(np.sum(np.asarray(Pf) ** 2, axis=(1, 2)))
    assert np.all(nrm <= sigma + 1e-12)
    # tensors inside the ball are untouched
    small = 0.1 * Q
    np.testing.assert_allclose(np.asarray(dfm.project_frobenius(small, sigma)), np.asarray(small))

    Ps = dfm.project_spectral(Q, sigma)
    s = np.linalg.svd(np.asarray(Ps), compute_uv=False)
    assert np.all(s <= sigma + 1e-9)
    # spectral projection equals SVD-clamp reference
    U, S, Vt = np.linalg.svd(np.asarray(Q))
    ref = np.einsum("eij,ej,ejk->eik", U, np.minimum(S, sigma), Vt)
    np.testing.assert_allclose(np.asarray(Ps), ref, atol=1e-9)

    # 3D spectral path
    Q3 = jnp.asarray(rng.normal(size=(20, 3, 3)))
    Ps3 = dfm.project_spectral(Q3, sigma)
    s3 = np.linalg.svd(np.asarray(Ps3), compute_uv=False)
    assert np.all(s3 <= sigma + 1e-9)


def test_max_norms(mesh2d):
    lvl = mesh2d
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    M = jnp.asarray([[0.2, 0.1], [0.0, -0.3]])
    u = coords @ M.T
    fro = float(dfm.max_frobenius_norm(coords, elems, u))
    assert fro == pytest.approx(float(jnp.sqrt(jnp.sum(M * M))), rel=1e-9)
    spec = float(dfm.max_spectral_norm(coords, elems, u))
    assert spec == pytest.approx(np.linalg.svd(np.asarray(M), compute_uv=False)[0], rel=1e-9)
