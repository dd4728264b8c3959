"""Assembled per-element NS Jacobian (ops.ns_elljac) vs matrix-free AD, and
the scatter-free explicit-transpose machinery (sparsity.transpose_values +
spmv_flat_pair) used by the adjoint solve's transposed preconditioner.

These paths serve the reference's own unstructured .ugx grids
(2d_admm.lua:131-132), where the brick-lattice fast path (ops.ns_patchjac)
is structurally unavailable."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.ops import ns_elljac as elljac
from admm_optim_tpu.ops import sparsity


def _setup(dim, num_refs, vorder=2):
    base = geomgen.channel_2d(diag="fixed") if dim == 2 else geomgen.channel_3d()
    levels = [base]
    for _ in range(num_refs):
        levels.append(refine(levels[-1]))
    hier = Hierarchy(levels)
    lvl = hier.fine
    space = nsops.NSSpace.build(lvl, vorder=vorder)
    coords = jnp.asarray(lvl.coords)
    return hier, space, coords


def _random_state(space, rng, scale=0.3):
    v = rng.normal(size=(space.dim, space.n_vel)) * scale
    p = rng.normal(size=(space.n_pressure,)) * scale
    return jnp.asarray(np.concatenate([v.reshape(-1), p]))


@pytest.mark.parametrize(
    "dim,num_refs,vorder,stab",
    [(2, 1, 2, 0.0), (2, 2, 2, 0.0), (3, 1, 2, 0.0), (2, 1, 1, 0.1)],
)
def test_elljac_matches_jvp_vjp(dim, num_refs, vorder, stab):
    hier, space, coords = _setup(dim, num_refs, vorder)
    visc = 0.05
    rng = np.random.default_rng(0)
    s0 = _random_state(space, rng)
    x = _random_state(space, rng, scale=1.0)

    wiring = elljac.build_wiring(space)
    W = elljac.make_assemble_fn(space, wiring, stab=stab)(coords, s0, visc)
    jv, jtv = elljac.make_matvec_fns(space, wiring)

    def R(ss):
        return nsops.ns_residual(space, coords, ss, visc, stab)

    y_ref = jax.jvp(R, (s0,), (x,))[1]
    err = float(jnp.linalg.norm(jv(x, W) - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-12, f"Jv mismatch: rel err {err}"

    _, vjp = jax.vjp(R, s0)
    yt_ref = vjp(x)[0]
    errt = float(jnp.linalg.norm(jtv(x, W) - yt_ref) / jnp.linalg.norm(yt_ref))
    assert errt < 1e-12, f"JTv mismatch: rel err {errt}"


@pytest.mark.parametrize("dim", [2, 3])
def test_elljac_bt_b_coupling(dim):
    """Stored-sub-block B^T equals the residual-difference coupling of
    solvers.ns_solver._bt_coupling, and make_b_fn is its exact transpose."""
    from admm_optim_tpu.solvers.ns_solver import _bt_coupling

    hier, space, coords = _setup(dim, 1)
    visc = 0.05
    rng = np.random.default_rng(1)
    s0 = _random_state(space, rng)
    zp = jnp.asarray(rng.normal(size=(space.n_pressure,)))
    zv = jnp.asarray(rng.normal(size=(space.dim, space.n_vel)))

    wiring = elljac.build_wiring(space)
    W = elljac.make_assemble_fn(space, wiring)(coords, s0, visc)
    bt = elljac.make_bt_fn(space, wiring)
    b = elljac.make_b_fn(space, wiring)
    ref_dummy = jnp.zeros((space.n_pressure,), coords.dtype)
    bt_res, _ = _bt_coupling(space, coords, visc, 0.0, ref_dummy)

    y = bt(zp, W)
    y_ref = bt_res(zp)
    err = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-12, f"B^T mismatch: rel err {err}"

    # adjointness <bt(zp), zv> == <zp, b(zv)>
    lhs = float(jnp.vdot(y, zv))
    rhs = float(jnp.vdot(zp, b(zv, W)))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_transpose_values_exact():
    """vals_T represents A^T exactly, including baked Dirichlet rows."""
    hier, space, coords = _setup(2, 1)
    from admm_optim_tpu.ops.p1space import P1VectorSpace

    p_space = P1VectorSpace.build(hier, dirichlet=("inlet", "wall"))
    pat = p_space.fine_pattern
    rng = np.random.default_rng(2)
    from admm_optim_tpu.ops.convdiff import convdiff_elem_mats

    w = jnp.asarray(rng.normal(size=(2, hier.fine.num_vertices)))
    em = convdiff_elem_mats(coords, jnp.asarray(hier.fine.elems), w, 0.05)
    vals = sparsity.bake_dirichlet(
        pat, sparsity.assemble_values(pat, em), jnp.asarray(p_space.fixed[-1])
    )
    vals_t = sparsity.transpose_values(pat, vals)
    A = np.asarray(sparsity.to_dense(pat, vals))
    At = np.asarray(sparsity.to_dense(pat, vals_t))
    assert np.allclose(At, A.T, atol=1e-13)

    # pair spmv: forward identical, vjp uses the transposed values and is
    # exact (it IS A^T x, not a surrogate)
    x = jnp.asarray(rng.normal(size=(pat.n_flat,)))
    y0 = sparsity.spmv_flat(pat, vals, x)
    y1 = sparsity.spmv_flat_pair(pat, vals, vals_t, x)
    assert float(jnp.linalg.norm(y0 - y1)) == 0.0
    ct = jnp.asarray(rng.normal(size=(pat.n_flat,)))
    g_ref = jax.vjp(lambda xx: sparsity.spmv_flat(pat, vals, xx), x)[1](ct)[0]
    g_pair = jax.vjp(
        lambda xx: sparsity.spmv_flat_pair(pat, vals, vals_t, xx), x
    )[1](ct)[0]
    err = float(jnp.linalg.norm(g_ref - g_pair) / jnp.linalg.norm(g_ref))
    assert err < 1e-13, f"pair-spmv transpose mismatch: {err}"


def test_vcycle_vjp_with_pair_spmv_exact():
    """jax.vjp of the V-cycle with stored transposed values equals the vjp
    of the plain V-cycle (the custom transpose changes the computation
    path, not the values) - the adjoint preconditioner stays vjp-exact."""
    hier, space, coords = _setup(2, 2)
    from admm_optim_tpu.ops.p1space import P1VectorSpace
    from admm_optim_tpu.solvers import mg as mgmod

    p_space = P1VectorSpace.build(hier, dirichlet=("inlet", "wall"))
    import dataclasses as dc

    struct = dc.replace(
        p_space.mg_structure(pre_smooth=2, post_smooth=2), smoother="jacobi"
    )
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(2, hier.fine.num_vertices)))
    data_plain = p_space.assemble_mg_convdiff(struct, coords, w, 0.05)
    data_pair = p_space.assemble_mg_convdiff(
        struct, coords, w, 0.05, with_transpose=True
    )
    r = jnp.asarray(rng.normal(size=(struct.patterns[-1].n_flat,)))
    ct = jnp.asarray(rng.normal(size=(struct.patterns[-1].n_flat,)))

    y0 = mgmod.vcycle(struct, data_plain, r)
    y1 = mgmod.vcycle(struct, data_pair, r)
    assert float(jnp.linalg.norm(y0 - y1)) < 1e-13 * float(jnp.linalg.norm(y0))

    g0 = jax.vjp(lambda rr: mgmod.vcycle(struct, data_plain, rr), r)[1](ct)[0]
    g1 = jax.vjp(lambda rr: mgmod.vcycle(struct, data_pair, rr), r)[1](ct)[0]
    err = float(jnp.linalg.norm(g0 - g1) / jnp.linalg.norm(g0))
    assert err < 1e-12, f"V-cycle transpose mismatch: {err}"


@pytest.mark.slow
def test_newton_stepped_with_elljac_matches():
    """End to end on an unstructured path: the stepped Newton with the
    per-element assembled Jacobian converges to the matrix-free solution."""
    from admm_optim_tpu.solvers import ns_solver

    hier, space, coords = _setup(2, 1)
    visc = 0.05
    wiring = elljac.build_wiring(space)
    assemble = elljac.make_assemble_fn(space, wiring)
    jv, _ = elljac.make_matvec_fns(space, wiring)

    g = nsops.inlet_values(space, coords)
    s0 = space.pack(g, jnp.zeros(space.n_pressure))
    cfg = ns_solver.NewtonConfig(max_iters=12, lin_max_iters=300)

    s_ref, _, _, conv_ref = ns_solver.newton_solve_stepped(
        space, coords, s0, visc, 0.0, cfg
    )
    s_jac, _, _, conv_jac = ns_solver.newton_solve_stepped(
        space, coords, s0, visc, 0.0, cfg,
        jac_builder=lambda c, s, nu: assemble(c, s, nu), jv_fn=jv,
    )
    assert bool(conv_ref) and bool(conv_jac)
    dv = float(jnp.linalg.norm(s_jac - s_ref) / jnp.linalg.norm(s_ref))
    assert dv < 1e-6, f"solutions diverge: {dv}"
