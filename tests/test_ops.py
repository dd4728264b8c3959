"""Operator layer: block-ELL assembly/SpMV, deformation element matrices,
constraint functionals (AD-consistency), prox projections.

Layout conventions under test (ops.geometry docstring): fields (C, V),
element tensors (d, d, E), element matrices (C, C, nl, nl, E), dense /
flat vectors component-major."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.ops import deformation as dfm
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.geometry import elem_geometry, gather_elem


@pytest.fixture(scope="module")
def mesh2d():
    return geomgen.channel_2d()


def test_spmv_matches_dense(mesh2d):
    lvl = mesh2d
    rng = np.random.default_rng(0)
    E, nl = lvl.elems.shape
    C, V = 2, lvl.num_vertices
    pat = sparsity.build_pattern(lvl.elems, V, C)
    em = rng.normal(size=(C, C, nl, nl, E))
    vals = sparsity.assemble_values(pat, jnp.asarray(em))
    x = rng.normal(size=(C, V))
    y = sparsity.spmv_cn(pat, vals, jnp.asarray(x))
    # dense reference in component-major flat ordering (c*V + v)
    A = np.zeros((C * V, C * V))
    for c in range(C):
        for d in range(C):
            for i in range(nl):
                for j in range(nl):
                    np.add.at(
                        A,
                        (c * V + lvl.elems[:, i], d * V + lvl.elems[:, j]),
                        em[c, d, i, j, :],
                    )
    np.testing.assert_allclose(np.asarray(y).ravel(), A @ x.ravel(), rtol=1e-10)
    D = np.asarray(sparsity.to_dense(pat, vals))
    np.testing.assert_allclose(D, A, atol=1e-10)
    # flat SpMV agrees
    yf = sparsity.spmv_flat(pat, vals, jnp.asarray(x.ravel()))
    np.testing.assert_allclose(np.asarray(yf), A @ x.ravel(), rtol=1e-10)
    # diagonal extraction
    np.testing.assert_allclose(
        np.asarray(sparsity.diag_cn(pat, vals)).ravel(), np.diag(A), rtol=1e-12
    )


def test_bake_dirichlet_symmetric(mesh2d):
    lvl = mesh2d
    rng = np.random.default_rng(5)
    E, nl = lvl.elems.shape
    C, V = 2, lvl.num_vertices
    pat = sparsity.build_pattern(lvl.elems, V, C)
    em = rng.normal(size=(C, C, nl, nl, E))
    em = em + np.swapaxes(np.swapaxes(em, 0, 1), 2, 3)  # symmetrize
    vals = sparsity.assemble_values(pat, jnp.asarray(em))
    fixed = jnp.asarray(np.repeat(lvl.vertex_mask(["inlet", "wall"])[None], C, 0))
    vals_bc = sparsity.bake_dirichlet(pat, vals, fixed)
    D = np.asarray(sparsity.to_dense(pat, vals_bc))
    np.testing.assert_allclose(D, D.T, atol=1e-10)
    fix_flat = np.asarray(fixed).ravel()
    np.testing.assert_allclose(D[fix_flat][:, fix_flat], np.eye(fix_flat.sum()), atol=1e-12)
    assert np.abs(D[fix_flat][:, ~fix_flat]).max() == 0.0


def test_deformation_energy_analytic(mesh2d):
    lvl = mesh2d
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    c_eps, c_grad, c_mass = 1.3, 0.7, 0.4
    A = dfm.deformation_elem_mats(coords, elems, c_eps, c_grad, c_mass)
    pat = sparsity.build_pattern(lvl.elems, lvl.num_vertices, 2)
    vals = sparsity.assemble_values(pat, A)
    M = jnp.asarray([[0.3, -0.2], [0.5, 0.1]])
    u = M @ coords.T  # u = M x as a (C, V) field
    energy = 0.5 * jnp.vdot(u, sparsity.spmv_cn(pat, vals, u))
    _, _, _, vol = elem_geometry(coords, elems)
    Vtot = float(vol.sum())
    symM = 0.5 * (M + M.T)
    # independent quadrature of the mass term: degree-2 rule per element
    from admm_optim_tpu.core.quadrature import simplex_rule

    bary, w = simplex_rule(2, 2)
    xe = gather_elem(coords, elems)  # (d, nl, E)
    xq = jnp.einsum("qb,dbe->dqe", jnp.asarray(bary), xe)
    uq = jnp.einsum("cd,dqe->cqe", M, xq)
    mass_term = jnp.einsum("e,q,cqe,cqe->", vol, jnp.asarray(w), uq, uq)
    expected = 0.5 * (
        c_eps * float(jnp.sum(symM * symM)) * Vtot
        + c_grad * float(jnp.sum(M * M)) * Vtot
        + c_mass * float(mass_term)
    )
    assert float(energy) == pytest.approx(expected, rel=1e-10)


def test_constraints_closed_form(mesh2d):
    lvl = mesh2d
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    _, _, _, vol = elem_geometry(coords, elems)
    V = float(vol.sum())
    z = jnp.zeros_like(coords.T)
    assert float(dfm.volume_defect(coords, elems, z, V)) == pytest.approx(0.0, abs=1e-10)
    # uniform dilation u = a*x: det(I+aI) = (1+a)^2
    a = 0.07
    gv = dfm.volume_defect(coords, elems, a * coords.T, V)
    assert float(gv) == pytest.approx(((1 + a) ** 2 - 1) * V, rel=1e-10)
    # translation u = c: barycenter shifts by c*V (unnormalized)
    c = jnp.asarray([0.3, -0.4])
    b0 = dfm.barycenter(coords, elems, z)
    b1 = dfm.barycenter(coords, elems, jnp.broadcast_to(c[:, None], z.shape))
    np.testing.assert_allclose(np.asarray(b1 - b0), np.asarray(c) * V, rtol=1e-10)


def test_constraint_grads_match_fd(mesh2d):
    lvl = mesh2d
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    _, _, _, vol = elem_geometry(coords, elems)
    V = float(vol.sum())
    b0 = dfm.barycenter(coords, elems, jnp.zeros_like(coords.T))
    rng = np.random.default_rng(1)
    u = jnp.asarray(0.01 * rng.normal(size=coords.T.shape))
    du = jnp.asarray(rng.normal(size=coords.T.shape))
    free = jnp.ones(coords.T.shape)
    B = dfm.constraint_grads(coords, elems, u, V, b0, free)
    eps = 1e-6
    gp = dfm.constraints(coords, elems, u + eps * du, V, b0)
    gm = dfm.constraints(coords, elems, u - eps * du, V, b0)
    fd = (gp - gm) / (2 * eps)
    ad = jnp.einsum("mcv,cv->m", B, du)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(fd), rtol=1e-6, atol=1e-8)


def test_prox_projections():
    rng = np.random.default_rng(2)
    Q = jnp.asarray(rng.normal(size=(2, 2, 50)))
    sigma = 0.8
    Pf = dfm.project_frobenius(Q, sigma)
    nrm = np.sqrt(np.sum(np.asarray(Pf) ** 2, axis=(0, 1)))
    assert np.all(nrm <= sigma + 1e-12)
    small = 0.1 * Q
    np.testing.assert_allclose(np.asarray(dfm.project_frobenius(small, sigma)), np.asarray(small))

    Ps = dfm.project_spectral(Q, sigma)
    Qe = np.moveaxis(np.asarray(Q), -1, 0)
    s = np.linalg.svd(np.moveaxis(np.asarray(Ps), -1, 0), compute_uv=False)
    assert np.all(s <= sigma + 1e-9)
    U, S, Vt = np.linalg.svd(Qe)
    ref = np.einsum("eij,ej,ejk->eik", U, np.minimum(S, sigma), Vt)
    np.testing.assert_allclose(np.moveaxis(np.asarray(Ps), -1, 0), ref, atol=1e-9)

    # 3D spectral path
    Q3 = jnp.asarray(rng.normal(size=(3, 3, 20)))
    Ps3 = dfm.project_spectral(Q3, sigma)
    s3 = np.linalg.svd(np.moveaxis(np.asarray(Ps3), -1, 0), compute_uv=False)
    assert np.all(s3 <= sigma + 1e-9)


def test_max_norms(mesh2d):
    lvl = mesh2d
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    M = jnp.asarray([[0.2, 0.1], [0.0, -0.3]])
    u = M @ coords.T
    fro = float(dfm.max_frobenius_norm(coords, elems, u))
    assert fro == pytest.approx(float(jnp.sqrt(jnp.sum(M * M))), rel=1e-9)
    spec = float(dfm.max_spectral_norm(coords, elems, u))
    assert spec == pytest.approx(np.linalg.svd(np.asarray(M), compute_uv=False)[0], rel=1e-9)
