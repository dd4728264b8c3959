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
    lam, res = ns_solver.adjoint_solve(space, coords, s, VISC)
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
