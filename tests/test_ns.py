"""Navier-Stokes: residual consistency, Newton convergence, adjoint and
AD shape gradient (verified against finite differences of the reduced drag)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.solvers import ns_solver

VISC = 0.5  # moderate Reynolds for the coarse test mesh


@pytest.fixture(scope="module")
def setup():
    levels = [geomgen.channel_2d()]
    levels.append(refine(levels[-1]))
    hier = Hierarchy(levels)
    lvl = hier.fine
    space = nsops.NSSpace.build(lvl, vorder=2)
    coords = jnp.asarray(lvl.coords)
    return hier, lvl, space, coords


def _initial_state(space, coords):
    g = nsops.inlet_values(space, coords)
    v0 = g  # inlet data, zero elsewhere
    p0 = jnp.zeros(space.n_pressure)
    return space.pack(v0, p0)


def test_residual_bc_rows(setup):
    _, lvl, space, coords = setup
    s = _initial_state(space, coords)
    r = nsops.ns_residual(space, coords, s, VISC)
    rv, _ = space.unpack(r)  # (d, n_vel)
    # Dirichlet rows of the initial state (v=g there) must vanish
    fixed = np.asarray(space.vel_fixed)
    np.testing.assert_allclose(np.asarray(rv)[:, fixed], 0.0, atol=1e-14)


def test_newton_converges_and_drag_positive(setup):
    _, lvl, space, coords = setup
    s0 = _initial_state(space, coords)
    # tight config: the acceptance threshold steers the inner GMRES floor
    cfg = ns_solver.NewtonConfig(accept_tol=1e-11, lin_rel_tol=1e-6)
    s, it, nrm, conv = ns_solver.newton_solve(space, coords, s0, VISC, cfg=cfg)
    assert bool(conv), f"Newton failed: iters={int(it)} nrm={float(nrm)}"
    assert float(nrm) < 1e-10
    J = float(nsops.drag(space, coords, s, VISC))
    assert J > 0.0
    # velocity at obstacle surface must be zero, inlet must carry profile
    v, p = space.unpack(s)  # v (d, n_vel)
    obs = np.asarray(space.vel_fixed) & ~np.asarray(space.inlet)
    assert np.abs(np.asarray(v)[:, obs]).max() < 1e-14
    assert float(jnp.max(v[0, :])) > 0.5  # flow actually moves


def test_adjoint_and_shape_gradient_match_fd(setup):
    hier, lvl, space, coords = setup
    s0 = _initial_state(space, coords)
    tight = ns_solver.NewtonConfig(accept_tol=1e-11, lin_rel_tol=1e-6)
    s, it, nrm, conv = ns_solver.newton_solve(space, coords, s0, VISC, cfg=tight)
    assert bool(conv)
    lam, res, _ = ns_solver.adjoint_solve(space, coords, s, VISC)
    assert float(res) < 1e-9

    obs_mask = jnp.asarray(lvl.subset_vertices["obstacle_surface"]).astype(coords.dtype)
    Jp = ns_solver.shape_gradient(space, coords, s, lam, VISC, 0.0, obs_mask)

    # finite-difference check of the REDUCED functional: perturb obstacle
    # vertices, re-solve NS, compare drag change against <J', dX>
    rng = np.random.default_rng(0)
    dX = rng.normal(size=coords.shape) * np.asarray(obs_mask)[:, None] * 1.0
    dX = jnp.asarray(dX)

    def reduced(eps):
        Xp = coords + eps * dX
        sp, _, nr, cv = ns_solver.newton_solve(space, Xp, s, VISC, cfg=tight)
        assert float(nr) < 1e-10
        return float(nsops.drag(space, Xp, sp, VISC))

    eps = 1e-5
    fd = (reduced(eps) - reduced(-eps)) / (2 * eps)
    ad = float(jnp.vdot(Jp, dX))
    assert ad == pytest.approx(fd, rel=2e-4), f"AD {ad} vs FD {fd}"


def test_p1p1_stabilized(setup):
    """Equal-order P1/P1 with Brezzi-Pitkaranta stabilization (the
    reference's `stab` knob, 2d_admm.lua:47) solves and lands near the
    Taylor-Hood drag value."""
    hier, lvl, space2, coords = setup
    space1 = nsops.NSSpace.build(lvl, vorder=1)
    g = nsops.inlet_values(space1, coords)
    s0 = space1.pack(g, jnp.zeros(space1.n_pressure))
    s, it, nrm, conv = ns_solver.newton_solve(space1, coords, s0, VISC, stab=0.05)
    assert bool(conv), f"P1/P1 Newton failed: {float(nrm)}"
    d1 = float(nsops.drag(space1, coords, s, VISC))
    # P2/P1 reference value on the same mesh
    s2, _, _, c2 = ns_solver.newton_solve(space2, coords, _initial_state(space2, coords), VISC)
    assert bool(c2)
    d2 = float(nsops.drag(space2, coords, s2, VISC))
    assert d1 == pytest.approx(d2, rel=0.25), (d1, d2)


def test_pcd_preconditioner(setup):
    """Block-triangular PCD Schur block (solvers.ns_solver.ns_pcd_M): at a
    fixed GMRES budget it must beat the block-diagonal lumped-mass Stokes
    surrogate on residual reduction (measured margin at visc=0.02 on the
    refs=2 channel is ~100x; this coarser test uses a softer factor), and
    a full Newton solve with it must converge."""
    from admm_optim_tpu.core.mesh import Hierarchy, refine
    from admm_optim_tpu.ops.p1space import P1VectorSpace
    import dataclasses

    hier, lvl, space, coords = setup
    visc = 0.05
    s0 = _initial_state(space, coords)
    cfg = ns_solver.NewtonConfig(max_iters=25, lin_max_iters=300)

    # velocity block (shared)
    ns_dir = ("inlet", "wall", "obstacle_surface")
    ext = Hierarchy(hier.levels + [refine(lvl)])
    pre_space = P1VectorSpace.build(ext, dirichlet=ns_dir)
    pre_struct = dataclasses.replace(
        pre_space.mg_structure(pre_smooth=2, post_smooth=2), smoother="jacobi"
    )
    pre_data, pdiag = ns_solver.ns_gmg_precond_data(
        space, pre_space, pre_struct, coords, visc, s=s0
    )

    p_space, p_struct = ns_solver.ns_pcd_spaces(hier)
    ap_data, fp_vals, mp = ns_solver.ns_pcd_precond_data(
        space, p_space, p_struct, coords, visc, s=s0
    )
    M_pcd = ns_solver.ns_pcd_M(
        space, pre_struct, pre_data, p_space, p_struct, ap_data, fp_vals, mp,
        coords=coords, visc=visc,
    )
    M_mass = ns_solver.ns_gmg_M(space, pre_struct, pre_data, pdiag)

    # fixed-budget GMRES on the Jacobian system with each Schur block
    from admm_optim_tpu.solvers.krylov import gmres

    r = nsops.ns_residual(space, coords, s0, visc)
    Jv = lambda x: jax.jvp(
        lambda s: nsops.ns_residual(space, coords, s, visc), (s0,), (x,)
    )[1]
    res_pcd = gmres(Jv, -r, M=M_pcd, restart=40, max_iters=160, rel_tol=1e-12)
    res_mass = gmres(Jv, -r, M=M_mass, restart=40, max_iters=160, rel_tol=1e-12)
    assert float(res_pcd.res_norm) < 0.5 * float(res_mass.res_norm)

    # full Newton with triangular PCD converges
    s, it, nrm, conv = ns_solver.newton_solve(
        space, coords, s0, visc, cfg=cfg, M=M_pcd
    )
    assert bool(conv)
    d = nsops.drag(space, coords, s, visc)
    assert np.isfinite(float(d)) and float(d) > 0


@pytest.mark.slow
def test_patch_convdiff_precond_matches_ell():
    """The patch-backend (brick-stencil) convection-diffusion operator of the
    NS velocity preconditioner equals the block-ELL assembly, and the model's
    NS solve converges with the patch velocity V-cycle (solvers.ns_solver.
    ns_gmg_precond_data_patch / patch_velocity_M)."""
    from admm_optim_tpu.core.patches import build_patchset
    from admm_optim_tpu.ops import patchstencil as st
    from admm_optim_tpu.ops import sparsity
    from admm_optim_tpu.ops.convdiff import (
        convdiff_corner_mats,
        convdiff_elem_mats,
    )
    from admm_optim_tpu.ops.p1space import P1VectorSpace
    from admm_optim_tpu.solvers import patch_mg as pmg

    dim = 2
    levels = [geomgen.channel_2d(diag="fixed")]
    for _ in range(2):
        levels.append(refine(levels[-1]))
    hier = Hierarchy(levels)
    ns_dir = ("inlet", "wall", "obstacle_surface")
    ps = build_patchset(hier, dirichlet=ns_dir)
    fine = hier.fine
    coords = jnp.asarray(fine.coords)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)))
    visc = 0.05

    space = P1VectorSpace.build(hier, dirichlet=ns_dir)
    pat = space.patterns[-1]
    em = convdiff_elem_mats(coords, jnp.asarray(fine.elems), w, visc)
    vals = sparsity.assemble_values(pat, em)
    vals = sparsity.bake_dirichlet(pat, vals, jnp.asarray(space.fixed[-1]))

    cw_p = st.to_patch(ps.fine, jnp.concatenate([coords.T, w], axis=0))
    k = ps.k
    tabs = pmg.make_level_tables(ps, coords.dtype)
    W = st.assemble_w(ps, k, cw_p, lambda c: convdiff_corner_mats(c, visc))
    W = st.bake_dirichlet_w(ps, k, W, free=tabs[k].free.astype(W.dtype))

    x_g = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)))
    free_g = jnp.asarray(~fine.vertex_mask(ns_dir), x_g.dtype)
    x_g = x_g * free_g[None]
    y_ell = sparsity.spmv_cn(pat, vals, x_g) * free_g[None]
    y_p = st.exchange_sum(
        None, st.apply_w(ps, W, st.to_patch(ps.fine, x_g)), tabs[k]
    ) * tabs[k].free[None]
    y_pg = st.from_patch(ps.fine, y_p, fine.num_vertices, mode="owner")
    assert float(jnp.max(jnp.abs(y_pg - y_ell))) < 1e-11 * float(
        jnp.max(jnp.abs(y_ell))
    ) + 1e-13

    # model-level: NS Newton converges with the patch velocity block and
    # agrees with the global backend
    from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig

    # same fixed-diagonal mesh for both backends (backend="global" would
    # otherwise generate the alternating-diagonal variant - a different
    # triangulation with a different discrete drag)
    lv = [geomgen.channel_2d(diag="fixed"), ]
    lv.append(refine(lv[-1]))
    shared = Hierarchy(lv)
    drags = {}
    for backend in ("global", "auto"):
        cfg = ProblemConfig(dim=2, num_refs=1, visc=0.05, backend=backend)
        prob = ObstacleShapeOpt(cfg, hier=shared)
        assert prob.use_patch_ns == (backend == "auto")
        s, it, nrm, conv = prob._ns_solve(prob.X0, prob.initial_state(prob.X0))
        assert bool(conv)
        drags[backend] = float(nsops.drag(prob.ns_space, prob.X0, s, 0.05))
    assert abs(drags["auto"] - drags["global"]) < 1e-6 * abs(drags["global"])


def test_transpose_M_exact_and_effective(setup):
    """transpose_M is the exact adjoint of the forward preconditioner
    (<Mx, y> == <x, M^T y>) and reproduces the forward Krylov convergence
    on the transposed system - the property the hand-built negated-
    advection surrogates measurably lack (see transpose_M docstring)."""
    from admm_optim_tpu.solvers.krylov import gmres

    _, lvl, space, coords = setup
    s0 = _initial_state(space, coords)
    tight = ns_solver.NewtonConfig(accept_tol=1e-11, lin_rel_tol=1e-6)
    s, _, _, conv = ns_solver.newton_solve(space, coords, s0, VISC, cfg=tight)
    assert bool(conv)

    # exactness on a NONSYMMETRIC linear map (diag surrogates are symmetric
    # and would not exercise the transpose at all)
    rng = np.random.default_rng(3)
    d1 = jnp.asarray(rng.normal(size=space.n_state)) + 2.0
    d2 = jnp.asarray(rng.normal(size=space.n_state))
    M = lambda r: r * d1 + jnp.roll(r, 1) * d2
    MT = ns_solver.transpose_M(M, space.n_state, coords.dtype)
    x = jnp.asarray(rng.normal(size=space.n_state))
    y = jnp.asarray(rng.normal(size=space.n_state))
    a = float(jnp.vdot(M(x), y))
    b = float(jnp.vdot(x, MT(y)))
    assert abs(a - b) <= 1e-12 * max(abs(a), abs(b))

    # forward vs transposed system with the same (transposed) M: the
    # transposed solve must track the forward one (eig(J^T M^T) = eig(M J))
    def R(ss):
        return nsops.ns_residual(space, coords, ss, VISC, 0.0)

    Md = nsops.diag_preconditioner(space, coords, VISC)
    MdT = ns_solver.transpose_M(Md, space.n_state, coords.dtype)
    Jv = lambda v: jax.jvp(R, (s,), (v,))[1]
    _, vjp = jax.vjp(R, s)
    Jt = lambda v: vjp(v)[0]
    gJ = jax.grad(lambda ss: nsops.drag(space, coords, ss, VISC))(s)
    rf = gmres(Jv, -gJ, M=Md, restart=80, max_iters=800, abs_tol=1e-30,
               rel_tol=1e-8)
    rt = gmres(Jt, -gJ, M=MdT, restart=80, max_iters=800, abs_tol=1e-30,
               rel_tol=1e-8)
    # parity: the transposed solve reaches within an order of magnitude of
    # the forward residual in the same iteration budget
    assert float(rt.res_norm) <= 10.0 * max(float(rf.res_norm), 1e-30)


@pytest.mark.slow
def test_stepped_adjoint_matches_monolithic():
    """The host-chunked adjoint (gmres_chunk_* cycle splitting, the
    flagship's large-problem path) solves the same system to the same
    target as the monolithic jitted adjoint, from the same state."""
    from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig

    cfg = ProblemConfig(dim=2, num_refs=1, visc=0.05)
    prob = ObstacleShapeOpt(cfg)
    X = prob.X0
    s, _, _, conv = prob._ns_solve(X, prob.initial_state(X))
    assert bool(conv)

    lam_m, res_m, it_m = prob._adjoint_pre(X, s, jnp.zeros_like(s))
    lam_s, res_s, it_s = prob._adjoint_stepped_fn(X, s, jnp.zeros_like(s))
    target = max(
        cfg.ns.lin_abs_tol,
        cfg.ns.adj_rel_tol * float(prob._adj_gj_norm(X, s)),
    )
    assert float(res_s) <= 1.01 * target
    nm = float(jnp.linalg.norm(lam_m))
    assert float(jnp.linalg.norm(lam_s - lam_m)) <= 1e-5 * nm
