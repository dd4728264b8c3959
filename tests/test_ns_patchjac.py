"""Assembled lattice NS Jacobian (ops.ns_patchjac) vs matrix-free AD.

The lattice-blocked apply must reproduce jax.jvp / jax.vjp of ns_residual
EXACTLY (same discrete operator, different data layout): 2D and 3D, on the
geomgen brick meshes that carry patch metadata."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.patches import build_patchset
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.ops import ns_patchjac as nsjac
from admm_optim_tpu.solvers import patch_mg as pmg

NS_DIR = ("inlet", "wall", "obstacle_surface")


def _setup(dim, num_refs):
    base = geomgen.channel_2d(diag="fixed") if dim == 2 else geomgen.channel_3d()
    levels = [base]
    for _ in range(num_refs):
        levels.append(refine(levels[-1]))
    hier = Hierarchy(levels)
    lvl = hier.fine
    space = nsops.NSSpace.build(lvl, vorder=2)
    ps = build_patchset(hier)
    pre_hier = Hierarchy(hier.levels + [refine(lvl)])
    pre_ps = build_patchset(pre_hier, dirichlet=NS_DIR)
    coords = jnp.asarray(lvl.coords)
    tab_f = pmg.make_level_tables(pre_ps, coords.dtype)[-1]
    tab_c = pmg.make_level_tables(ps, coords.dtype)[-1]
    return hier, space, ps, pre_ps, tab_f, tab_c, coords


def _random_state(space, rng, scale=0.3):
    v = rng.normal(size=(space.dim, space.n_vel)) * scale
    p = rng.normal(size=(space.n_pressure,)) * scale
    return jnp.asarray(np.concatenate([v.reshape(-1), p]))


@pytest.mark.parametrize("dim,num_refs", [(2, 1), (2, 2), (3, 1)])
@pytest.mark.slow
def test_assembled_jacobian_matches_jvp(dim, num_refs):
    hier, space, ps, pre_ps, tab_f, tab_c, coords = _setup(dim, num_refs)
    visc = 0.05
    rng = np.random.default_rng(0)
    s0 = _random_state(space, rng)
    x = _random_state(space, rng, scale=1.0)

    wiring = nsjac.build_wiring(ps)
    assemble = nsjac.make_assemble_fn(space, ps, pre_ps, wiring)
    jv, jtv = nsjac.make_matvec_fns(space, ps, pre_ps, wiring, tab_f, tab_c)
    W = assemble(coords, s0, visc)

    def R(ss):
        return nsops.ns_residual(space, coords, ss, visc, 0.0)

    y_ref = jax.jvp(R, (s0,), (x,))[1]
    y = jv(x, W)
    err = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-12, f"Jv mismatch: rel err {err}"

    _, vjp = jax.vjp(R, s0)
    yt_ref = vjp(x)[0]
    yt = jtv(x, W)
    errt = float(jnp.linalg.norm(yt - yt_ref) / jnp.linalg.norm(yt_ref))
    assert errt < 1e-12, f"JTv mismatch: rel err {errt}"


@pytest.mark.parametrize("dim", [2, 3])
def test_assembled_bt_matches_residual_trick(dim):
    """make_bt_fn (stored velocity-pressure sub-blocks) must equal the
    residual-difference B^T of solvers.ns_solver._bt_coupling."""
    from admm_optim_tpu.solvers.ns_solver import _bt_coupling

    hier, space, ps, pre_ps, tab_f, tab_c, coords = _setup(dim, 1)
    visc = 0.05
    rng = np.random.default_rng(1)
    s0 = _random_state(space, rng)
    zp = jnp.asarray(rng.normal(size=(space.n_pressure,)))

    wiring = nsjac.build_wiring(ps)
    W = nsjac.make_assemble_fn(space, ps, pre_ps, wiring)(coords, s0, visc)
    bt_jac = nsjac.make_bt_fn(space, ps, pre_ps, wiring, tab_f)
    ref_dummy = jnp.zeros((space.n_pressure,), coords.dtype)
    bt_res, _ = _bt_coupling(space, coords, visc, 0.0, ref_dummy)

    y = bt_jac(zp, W)
    y_ref = bt_res(zp)
    err = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-12, f"B^T mismatch: rel err {err}"


@pytest.mark.parametrize("dim", [2, 3])
def test_pcd_patch_fp_matches_ell(dim):
    """The patch-assembled pressure convection-diffusion stencil Fp equals
    the block-ELL assembly of ns_pcd_precond_data (on the free subspace)."""
    from admm_optim_tpu.ops import patchstencil as pst
    from admm_optim_tpu.ops import sparsity
    from admm_optim_tpu.ops.convdiff import convdiff_corner_mats, convdiff_elem_mats
    from admm_optim_tpu.solvers import ns_solver

    hier, space, ps, pre_ps, tab_f, tab_c, coords = _setup(dim, 1)
    lvl = hier.fine
    visc = 0.05
    rng = np.random.default_rng(2)
    w_p1 = jnp.asarray(rng.normal(size=(dim, lvl.num_vertices)))

    p_space, _ = ns_solver.ns_pcd_spaces(hier)
    pat = p_space.fine_pattern
    em = convdiff_elem_mats(
        coords, jnp.asarray(lvl.elems), w_p1, visc, art_diff=False, ncomp=1
    )
    vals = sparsity.bake_dirichlet(
        pat, sparsity.assemble_values(pat, em), jnp.asarray(p_space.fixed[-1])
    )

    p_tabs = ns_solver.pcd_patch_tables(hier, ps, coords.dtype)
    cw = jnp.concatenate([coords.T, w_p1], axis=0)
    W_fp = pst.assemble_w(
        ps, ps.k, pst.to_patch(ps.fine, cw),
        lambda c: convdiff_corner_mats(c, visc, art_diff=False, ncomp=1),
        free=p_tabs[-1].free,
    )

    free_g = jnp.asarray(~lvl.vertex_mask(("inlet",)), coords.dtype)
    x = jnp.asarray(rng.normal(size=(lvl.num_vertices,))) * free_g
    y_ell = sparsity.spmv_flat(pat, vals, x) * free_g
    y_p = pst.exchange_sum(
        ps.fine, pst.apply_w(ps, W_fp, pst.to_patch(ps.fine, x[None])),
        tab=p_tabs[-1],
    )
    y_patch = pst.from_patch(ps.fine, y_p, lvl.num_vertices, mode="owner")[0]
    y_patch = y_patch * free_g
    err = float(jnp.linalg.norm(y_patch - y_ell) / jnp.linalg.norm(y_ell))
    assert err < 1e-12, f"Fp mismatch: {err}"


@pytest.mark.slow
def test_newton_with_assembled_jacobian_matches():
    """End to end: the stepped Newton solve with the assembled-Jacobian
    matvec converges to the same flow as the matrix-free path."""
    from admm_optim_tpu.solvers import ns_solver

    hier, space, ps, pre_ps, tab_f, tab_c, coords = _setup(2, 1)
    visc = 0.05
    wiring = nsjac.build_wiring(ps)
    assemble = nsjac.make_assemble_fn(space, ps, pre_ps, wiring)
    jv, _ = nsjac.make_matvec_fns(space, ps, pre_ps, wiring, tab_f, tab_c)

    g = nsops.inlet_values(space, coords)
    s0 = space.pack(g, jnp.zeros(space.n_pressure))
    cfg = ns_solver.NewtonConfig(max_iters=12, lin_max_iters=300)

    s_ref, it_ref, nrm_ref, conv_ref = ns_solver.newton_solve_stepped(
        space, coords, s0, visc, 0.0, cfg
    )
    s_jac, it_jac, nrm_jac, conv_jac = ns_solver.newton_solve_stepped(
        space, coords, s0, visc, 0.0, cfg,
        jac_builder=lambda c, s, nu: assemble(c, s, nu), jv_fn=jv,
    )
    assert bool(conv_ref) and bool(conv_jac)
    dv = float(jnp.linalg.norm(s_jac - s_ref) / jnp.linalg.norm(s_ref))
    assert dv < 1e-6, f"solutions diverge: {dv}"
