"""ADMM inner solver: constrained Newton x-update (KKT correctness) and the
full ADMM loop with a synthetic shape gradient (no flow solve needed)."""
import jax.numpy as jnp
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.ops import deformation as dfm
from admm_optim_tpu.ops.p1space import P1VectorSpace
from admm_optim_tpu.optim import admm


@pytest.fixture(scope="module")
def setup():
    levels = [geomgen.channel_2d()]
    for _ in range(2):
        levels.append(refine(levels[-1]))
    hier = Hierarchy(levels)
    lvl = hier.fine
    space = P1VectorSpace.build(hier)  # Dirichlet: inlet, wall, outlet
    cfg = admm.ADMMConfig(admm_steps=60, ns_max_its=8, tau=1.0, lin_max_iters=100)
    struct = space.mg_structure()
    coords = jnp.asarray(lvl.coords)
    elems = jnp.asarray(lvl.elems)
    mgdata = space.assemble_mg(struct, coords, cfg.c_eps, cfg.tau, cfg.c_mass)
    free = space.free_mask()
    from admm_optim_tpu.ops.geometry import elem_geometry

    _, _, _, vol = elem_geometry(coords, elems)
    ref_vol = jnp.sum(vol)
    ref_bary = dfm.barycenter(coords, elems, jnp.zeros_like(coords.T))
    # synthetic "shape gradient": radial push on obstacle vertices
    obs = jnp.asarray(lvl.subset_vertices["obstacle_surface"]).astype(coords.dtype)
    Jp = -coords / jnp.maximum(jnp.linalg.norm(coords, axis=1, keepdims=True), 0.3)
    Jp = (Jp * obs[:, None] * 0.15).T  # (C, V)
    return hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp


def test_newton_xupdate_kkt(setup):
    hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp = setup
    d = coords.shape[1]
    E = elems.shape[0]
    lam = jnp.zeros((d, d, E))
    q_proj = jnp.zeros((d, d, E))
    u, Lmb, it, lin, failed = admm.newton_xupdate(
        cfg, struct, mgdata, coords, elems, free, Jp,
        jnp.asarray(1.0), lam, q_proj, ref_vol, ref_bary,
        jnp.zeros_like(coords.T), jnp.zeros(1 + d),
    )
    assert not bool(failed), f"x-update Newton failed after {int(it)} its"
    # geometric constraints must hold at the solution
    g = dfm.constraints(coords, elems, u, ref_vol, ref_bary)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
    # stationarity: A u + r_lin + Lambda^T B = 0 on free dofs
    from admm_optim_tpu.ops import sparsity

    r_lin = (1.0 * Jp + dfm.tensor_rhs(coords, elems, lam - cfg.tau * q_proj)) * free
    B = dfm.constraint_grads(coords, elems, u, ref_vol, ref_bary, free)
    Lu = (
        sparsity.spmv_cn(struct.patterns[-1], mgdata.vals[-1], u)
        + r_lin
        + jnp.einsum("m,mcv->cv", Lmb, B)
    ) * free
    assert float(jnp.linalg.norm(Lu)) < 1e-7
    # the obstacle actually moved
    assert float(jnp.linalg.norm(u)) > 1e-3
    # boundary conditions respected
    assert float(jnp.abs(u * (1 - free)).max()) == 0.0


def test_admm_inner_converges(setup):
    hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp = setup
    sigma = 0.3
    st = admm.admm_inner(
        cfg, struct, mgdata, coords, elems, free, Jp,
        jnp.asarray(sigma), jnp.asarray(1.0), ref_vol, ref_bary,
    )
    assert not bool(st.failed), f"ADMM failed at it {int(st.admm_it)}"
    assert bool(st.converged)
    # the gradient-norm constraint holds up to the reference's tolerance band
    mx = float(dfm.max_frobenius_norm(coords, elems, st.u))
    assert mx <= sigma * (1 + cfg.admm_gradient_tolerance) + 1e-12
    # geometric constraints hold
    g = dfm.constraints(coords, elems, st.u, ref_vol, ref_bary)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
    # deformed mesh stays valid (positive element volumes)
    from admm_optim_tpu.ops.geometry import elem_geometry

    _, detJ, _, _ = elem_geometry(coords + st.u.T, elems)
    assert float(jnp.min(detJ)) > 0.0


def test_admm_spectral_norm(setup):
    hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp = setup
    import dataclasses

    cfg_s = dataclasses.replace(cfg, norm_name="spectral")
    st = admm.admm_inner(
        cfg_s, struct, mgdata, coords, elems, free, Jp,
        jnp.asarray(0.3), jnp.asarray(1.0), ref_vol, ref_bary,
    )
    assert not bool(st.failed)
    mx = float(dfm.max_spectral_norm(coords, elems, st.u))
    assert mx <= 0.3 * (1 + cfg.admm_gradient_tolerance) + 1e-12


@pytest.mark.slow
def test_xupdate_relative_tolerance(setup):
    """The relative Lu/Llambda branch (2d:1165, -nsRelLuTol/-nsRelLlambdaTol):
    with increment/absolute tests disabled, a loose relative tolerance must
    stop the Newton loop; with ALL tests disabled it must exhaust ns_max_its
    and flag failure."""
    hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp = setup
    import dataclasses

    d = coords.shape[1]
    E = elems.shape[0]
    lam = jnp.zeros((d, d, E))
    q_proj = jnp.zeros((d, d, E))

    def run(c):
        return admm.newton_xupdate(
            c, struct, mgdata, coords, elems, free, Jp,
            jnp.asarray(1.0), lam, q_proj, ref_vol, ref_bary,
            jnp.zeros_like(coords.T), jnp.zeros(1 + d),
        )

    cfg_rel = dataclasses.replace(
        cfg, ns_tol=0.0, ns_abs_tol=0.0, ns_abs_llambda_tol=0.0,
        ns_rel_tol=0.9, ns_rel_llambda_tol=0.9,
    )
    u, Lmb, it, lin, failed = run(cfg_rel)
    assert not bool(failed)
    assert int(it) < cfg.ns_max_its

    cfg_none = dataclasses.replace(
        cfg, ns_tol=0.0, ns_abs_tol=0.0, ns_abs_llambda_tol=0.0,
        ns_rel_tol=0.0, ns_rel_llambda_tol=0.0,
    )
    _, _, it2, _, failed2 = run(cfg_none)
    assert bool(failed2) and int(it2) == cfg.ns_max_its


@pytest.mark.slow
def test_lambda_init_warm_start(setup):
    """-lambda_vol/-lambda_x/-lambda_y: the multiplier warm start must not
    change the converged KKT point, and a wrong length must raise."""
    hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp = setup
    import dataclasses

    cfg_w = dataclasses.replace(cfg, lambda_init=(0.1, -0.05, 0.02))
    st0 = admm.admm_inner(
        cfg, struct, mgdata, coords, elems, free, Jp,
        jnp.asarray(0.3), jnp.asarray(1.0), ref_vol, ref_bary,
    )
    st1 = admm.admm_inner(
        cfg_w, struct, mgdata, coords, elems, free, Jp,
        jnp.asarray(0.3), jnp.asarray(1.0), ref_vol, ref_bary,
    )
    assert bool(st1.converged)
    np.testing.assert_allclose(
        np.asarray(st1.u), np.asarray(st0.u), rtol=0, atol=1e-6
    )
    with pytest.raises(ValueError, match="lambda_init"):
        admm.admm_inner(
            dataclasses.replace(cfg, lambda_init=(1.0,)), struct, mgdata,
            coords, elems, free, Jp, jnp.asarray(0.3), jnp.asarray(1.0),
            ref_vol, ref_bary,
        )


@pytest.mark.slow
def test_admm_over_relaxation(setup):
    """relax_alpha (beyond the reference): accelerated convergence to the
    SAME constrained fixed point - constraints hold, gradient bound holds,
    and the iterate agrees with the unrelaxed solution."""
    hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp = setup
    import dataclasses

    st0 = admm.admm_inner(
        cfg, struct, mgdata, coords, elems, free, Jp,
        jnp.asarray(0.3), jnp.asarray(1.0), ref_vol, ref_bary,
    )
    st = admm.admm_inner(
        dataclasses.replace(cfg, relax_alpha=1.4), struct, mgdata, coords,
        elems, free, Jp, jnp.asarray(0.3), jnp.asarray(1.0), ref_vol, ref_bary,
    )
    assert bool(st.converged) and not bool(st.failed)
    assert int(st.admm_it) <= int(st0.admm_it)
    g = dfm.constraints(coords, elems, st.u, ref_vol, ref_bary)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
    mx = float(dfm.max_frobenius_norm(coords, elems, st.u))
    assert mx <= 0.3 * (1 + cfg.admm_gradient_tolerance) + 1e-12
    # same fixed point up to the ADMM tolerance scale
    du = float(jnp.linalg.norm(st.u - st0.u)) / max(float(jnp.linalg.norm(st0.u)), 1e-30)
    assert du < 0.05


@pytest.mark.slow
def test_stepped_driver_matches_monolithic_and_reports_iterates(setup):
    """admm_inner_stepped (host-stepped twin) reaches the same fixed point
    as the jitted while-loop and fires iter_cb with every ADMM iterate's u
    (the -bOutputIntermediateUp hook, reference 2d:84)."""
    hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp = setup
    from admm_optim_tpu.optim.spaces import GlobalOps

    def builder(mgdata_, coords_):
        return GlobalOps(struct, mgdata_, coords_, elems, free)

    seen = []
    st = admm.admm_inner_stepped(
        cfg, builder, (mgdata, coords), Jp, 0.3, 1.0, ref_vol, ref_bary,
        {}, iter_cb=lambda k, u: seen.append((k, np.asarray(u))),
    )
    assert bool(st.converged) and not bool(st.failed)
    # one callback per executed ADMM iteration, indices monotone from 0
    assert len(seen) > 0
    assert [k for k, _ in seen] == list(range(len(seen)))
    # the last reported iterate IS the final u
    np.testing.assert_array_equal(seen[-1][1], np.asarray(st.u))
    # same fixed point as the monolithic jitted loop
    st_ref = admm.admm_inner(
        cfg, struct, mgdata, coords, elems, free, Jp,
        jnp.asarray(0.3), jnp.asarray(1.0), ref_vol, ref_bary,
    )
    assert int(st.admm_it) == int(st_ref.admm_it)
    np.testing.assert_allclose(
        np.asarray(st.u), np.asarray(st_ref.u), rtol=0, atol=1e-8
    )


def test_solver_iteration_accounting_and_debug_fields(setup):
    """Per-solve-slot Krylov sums (the reference's sum_rhssolver/sum_b*solver
    counters, 2d:1379-1381) are carried by both ADMM drivers and sum to the
    total; the stepped driver exposes the -bDebugOutput field triple."""
    hier, lvl, space, cfg, struct, mgdata, coords, elems, free, ref_vol, ref_bary, Jp = setup
    st = admm.admm_inner(
        cfg, struct, mgdata, coords, elems, free, Jp,
        jnp.asarray(0.3), jnp.asarray(1.0), ref_vol, ref_bary,
    )
    d = coords.shape[1]
    si = np.asarray(st.solver_iters)
    assert si.shape == (2 + d,)  # rhs + (1+d) constraint solves
    assert int(si.sum()) == int(st.total_lin_iters)
    assert int(si[0]) > 0  # the rhs solve always iterates

    from admm_optim_tpu.optim.spaces import GlobalOps

    def builder(mgdata_, coords_):
        return GlobalOps(struct, mgdata_, coords_, elems, free)

    dbg = {}
    st2 = admm.admm_inner_stepped(
        cfg, builder, (mgdata, coords), Jp, 0.3, 1.0, ref_vol, ref_bary,
        {}, debug_out=dbg,
    )
    np.testing.assert_array_equal(
        np.asarray(st2.solver_iters), np.asarray(st.solver_iters)
    )
    # debug fields: Lu is the last PRE-update defect, du the last increment,
    # rhs_large = -(Lu + B.dLambda); at convergence |Lu| and |du| are small
    for k in ("Lu", "rhs_large", "du"):
        assert dbg[k].shape == st2.u.shape
        assert np.all(np.isfinite(np.asarray(dbg[k])))
    assert float(jnp.linalg.norm(dbg["du"])) < 1e-2
