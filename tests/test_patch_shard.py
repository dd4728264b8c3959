"""Sharded (halo-exchange) patch multigrid == single-device patch multigrid.

SURVEY.md section 4: multi-device behavior is validated on the 8-virtual-
CPU-device mesh (conftest), the TPU analogue of testing MPI domain
decomposition without a cluster.  Every test compares the shard_map spmd
path bit-for-bit-to-roundoff against the single-device patch backend on the
SAME padded patch set, so any halo/psum bug shows up as a numeric diff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.patches import build_patchset, pad_patchset
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops.deformation import deformation_corner_mats, deformation_elem_mats
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.p1space import P1VectorSpace
from admm_optim_tpu.parallel.patch_shard import build_sharded_mg
from admm_optim_tpu.solvers import patch_mg as pmg


N_DEV = 8


def _mesh():
    return Mesh(np.asarray(jax.devices()[:N_DEV]), ("space",))


def _hier(dim, refs):
    if dim == 2:
        lvl0 = geomgen.channel_2d(n_side=(3, 2), diag="fixed")  # P=34 -> pad 40
    else:
        lvl0 = geomgen.channel_3d(n_side=(2, 1, 1))  # P=44 -> pad 48
    levels = [lvl0]
    for _ in range(refs):
        levels.append(refine(levels[-1]))
    return Hierarchy(levels)


def _rand_additive(ps, key, dtype=jnp.float64):
    lvl = ps.fine
    shape = (ps.dim,) + lvl.lat_shape + (lvl.P,)
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 1)])
def test_sharded_exchange_matches(dim, refs):
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    sh = build_sharded_mg(ps, _mesh())
    ps_pad = sh.ps
    assert ps_pad.P % N_DEV == 0 and ps_pad.P > ps.P  # padding exercised

    x = _rand_additive(ps_pad, jax.random.PRNGKey(0))
    tab = st.make_tables(ps_pad.fine, x.dtype)
    ref = st.exchange_sum(None, x, tab)

    fs = sh.field_spec()
    f = jax.jit(
        jax.shard_map(
            lambda t, v: st.exchange_sum(None, v, t, spmd=sh.spmd),
            mesh=sh.mesh,
            in_specs=(sh.table_specs(ps_pad.k), fs),
            out_specs=fs,
            check_vma=False,
        )
    )
    got = f(sh.make_tables(x.dtype)[ps_pad.k], sh.to_patch_sharded_raw(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-12)


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 1)])
def test_halo_ppermute_matches_allgather(dim, refs):
    """The point-to-point halo sweep (static shard-delta ppermutes) and the
    all-gather fallback produce identical consistent vectors; both match the
    single-device exchange (checked on every level incl. coarse)."""
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    sh = build_sharded_mg(ps, _mesh())
    ps_pad = sh.ps
    for l, lvl in enumerate(ps_pad.levels):
        deltas = st.compute_halo_deltas(lvl, N_DEV)
        assert deltas is not None
        # contiguous-block sharding: few distinct neighbor shards per face
        for ax in deltas:
            for side in ax:
                assert len(side) <= 4
        shape = (ps_pad.dim,) + lvl.lat_shape + (lvl.P,)
        x = jax.random.normal(jax.random.PRNGKey(l), shape, jnp.float64)
        ref = st.exchange_sum(None, x, st.make_tables(lvl, x.dtype))
        fs = sh.field_spec()
        tab_pp = st.make_tables(lvl, x.dtype, nshards=N_DEV)
        tab_ag = st.make_tables(lvl, x.dtype)  # halo_deltas=None -> all-gather
        for tab in (tab_pp, tab_ag):
            spec = sh.table_specs(l)
            spec = type(spec)(
                **{**spec.__dict__, "halo_deltas": tab.halo_deltas}
            )
            f = jax.jit(
                jax.shard_map(
                    lambda t, v: st.exchange_sum(None, v, t, spmd=sh.spmd),
                    mesh=sh.mesh,
                    in_specs=(spec, fs),
                    out_specs=fs,
                    check_vma=False,
                )
            )
            got = f(tab, sh.to_patch_sharded_raw(x))
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=0, atol=1e-12
            )


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 1)])
@pytest.mark.slow
def test_sharded_mg_solve_matches(dim, refs):
    hier = _hier(dim, refs)
    ps_raw = build_patchset(hier)
    sh = build_sharded_mg(ps_raw, _mesh())
    ps = sh.ps
    fine = hier.fine
    coords = jnp.asarray(fine.coords)

    # single-device reference on the SAME padded patch set
    struct1 = pmg.PatchMGStructure(ps)
    tabs1 = pmg.make_level_tables(ps, coords.dtype)

    space = P1VectorSpace.build(hier)
    pat0 = space.patterns[0]
    fixed0 = np.asarray(space.fixed[0])

    def base_dense_fn(coords0):
        em0 = deformation_elem_mats(
            coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
        )
        v0 = sparsity.assemble_values(pat0, em0)
        v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
        return jnp.linalg.inv(sparsity.to_dense(pat0, v0))

    corner_fn = lambda c: deformation_corner_mats(c, 1.0, 1.0, 1.0)
    data1 = pmg.assemble_patch_mg(ps, struct1, coords, corner_fn, base_dense_fn, tabs1)

    # sharded assembly
    coords_p = sh.to_patch_sharded(coords.T)
    tabs_sh = sh.make_tables(coords.dtype)
    data_sh = jax.jit(sh.assemble_fn(corner_fn, base_dense_fn))(coords_p, tabs_sh)

    for l in range(len(ps.levels)):
        np.testing.assert_allclose(
            np.asarray(data_sh.W[l]), np.asarray(data1.W[l]), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(data_sh.inv_diag[l]), np.asarray(data1.inv_diag[l]), atol=1e-12
        )
        np.testing.assert_allclose(
            float(data_sh.lmax[l]), float(data1.lmax[l]), rtol=1e-10
        )
    np.testing.assert_allclose(
        np.asarray(data_sh.base_inv), np.asarray(data1.base_inv), atol=1e-10
    )

    # solve: same rhs, same tolerances -> same iterates
    rng = np.random.default_rng(1)
    b_g = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)), coords.dtype)
    b_g = b_g * space.free_mask().astype(coords.dtype)
    b_p = st.to_patch(ps.fine, b_g)

    res1 = pmg.cg_p(struct1, data1, b_p, max_iters=40, rel_tol=1e-10)
    res_sh = jax.jit(sh.solve_fn(max_iters=40, rel_tol=1e-10))(
        data_sh, sh.to_patch_sharded_raw(b_p)
    )
    assert int(res_sh.iters) == int(res1.iters)
    assert bool(res_sh.converged)
    np.testing.assert_allclose(
        np.asarray(res_sh.x), np.asarray(res1.x), atol=1e-9
    )

    # the solution actually solves the global system
    A = lambda x: st.exchange_sum(
        None, st.apply_w(ps, data1.W[ps.k], x), tabs1[ps.k]
    ) * tabs1[ps.k].free[None].astype(x.dtype)
    r = b_p - A(jnp.asarray(res_sh.x))
    rn = float(jnp.sqrt(st.owner_dot(ps.fine, r, r)))
    bn = float(jnp.sqrt(st.owner_dot(ps.fine, b_p, b_p)))
    assert rn / bn < 1e-9


@pytest.mark.slow
def test_sharded_ir_solve_matches_at_scale():
    """Mixed-precision IR solve (cg_ir_p) sharded over the 8-device mesh ==
    single device, at a NON-tiny size (2D refs=3, 4 MG levels, 5k+ dofs):
    the round-1 shard tests only exercised refs<=2, leaving the deeper
    hierarchy's agglomeration-free transfer/exchange chain uncovered
    (VERDICT r1 item 7)."""
    dim, refs = 2, 3
    hier = _hier(dim, refs)
    ps_raw = build_patchset(hier)
    sh = build_sharded_mg(ps_raw, _mesh())
    ps = sh.ps
    fine = hier.fine
    coords = jnp.asarray(fine.coords)

    struct1 = pmg.PatchMGStructure(ps)
    tabs1 = pmg.make_level_tables(ps, coords.dtype)
    space = P1VectorSpace.build(hier)
    pat0 = space.patterns[0]
    fixed0 = np.asarray(space.fixed[0])

    def base_dense_fn(coords0):
        em0 = deformation_elem_mats(
            coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
        )
        v0 = sparsity.assemble_values(pat0, em0)
        v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
        return jnp.linalg.inv(sparsity.to_dense(pat0, v0))

    corner_fn = lambda c: deformation_corner_mats(c, 1.0, 1.0, 1.0)
    data1 = pmg.assemble_patch_mg(ps, struct1, coords, corner_fn, base_dense_fn, tabs1)

    coords_p = sh.to_patch_sharded(coords.T)
    tabs_sh = sh.make_tables(coords.dtype)
    data_sh = jax.jit(sh.assemble_fn(corner_fn, base_dense_fn))(coords_p, tabs_sh)

    rng = np.random.default_rng(3)
    b_g = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)), coords.dtype)
    b_g = b_g * space.free_mask().astype(coords.dtype)
    b_p = st.to_patch(ps.fine, b_g)

    res1 = pmg.cg_ir_p(
        struct1, data1, b_p, rel_tol=1e-10, max_rounds=4, inner_rel=1e-5,
        inner_iters=40,
    )
    res_sh = jax.jit(
        sh.solve_ir_fn(rel_tol=1e-10, max_rounds=4, inner_rel=1e-5,
                       inner_iters=40)
    )(data_sh, sh.to_patch_sharded_raw(b_p))
    assert bool(res_sh.converged)
    assert int(res_sh.rounds) == int(res1.rounds)
    assert int(res_sh.inner_iters) == int(res1.inner_iters)
    x1 = np.asarray(res1.x_hi) + np.asarray(res1.x_lo)
    xs = np.asarray(res_sh.x_hi) + np.asarray(res_sh.x_lo)
    np.testing.assert_allclose(xs, x1, atol=1e-11)
    # and it solves the global f64-evaluated system to the target
    A = lambda x: st.exchange_sum(
        None, st.apply_w(ps, data1.W[ps.k], x), tabs1[ps.k]
    ) * tabs1[ps.k].free[None].astype(x.dtype)
    r = b_p - A(jnp.asarray(xs))
    rn = float(jnp.sqrt(st.owner_dot(ps.fine, r, r)))
    bn = float(jnp.sqrt(st.owner_dot(ps.fine, b_p, b_p)))
    assert rn / bn < 1e-10


@pytest.mark.slow
def test_sharded_admm_matches_single_device():
    """The FULL ADMM inner loop (z-prox + constrained Newton + dual ascent)
    under shard_map == the single-device patch path, iterate for iterate."""
    from admm_optim_tpu.optim import admm
    from admm_optim_tpu.optim.spaces import PatchOps
    from admm_optim_tpu.ops import deformation as dfm
    from admm_optim_tpu.ops.geometry import elem_geometry

    dim, refs = 2, 2
    hier = _hier(dim, refs)
    ps_raw = build_patchset(hier)
    fine = hier.fine
    coords = jnp.asarray(fine.coords)
    elems = jnp.asarray(fine.elems)
    cfg = admm.ADMMConfig(
        admm_steps=4, ns_max_its=5, lin_max_iters=60, tau=2.0,
        admm_tolerance=1e-2,
    )

    space = P1VectorSpace.build(hier)
    pat0 = space.patterns[0]
    fixed0 = jnp.asarray(space.fixed[0])

    def base_dense_fn(coords0):
        em0 = deformation_elem_mats(
            coords0, jnp.asarray(hier.levels[0].elems), cfg.c_eps, cfg.tau,
            cfg.c_mass,
        )
        v0 = sparsity.assemble_values(pat0, em0)
        v0 = sparsity.bake_dirichlet(pat0, v0, fixed0)
        return jnp.linalg.inv(sparsity.to_dense(pat0, v0))

    corner_fn = lambda c: deformation_corner_mats(c, cfg.c_eps, cfg.tau, cfg.c_mass)

    # problem data
    obs = jnp.asarray(fine.subset_vertices["obstacle_surface"]).astype(coords.dtype)
    Jp_g = (
        -coords / jnp.maximum(jnp.linalg.norm(coords, axis=1, keepdims=True), 0.3)
        * obs[:, None] * 0.05
    ).T * space.free_mask().astype(coords.dtype)
    _, _, _, vol = elem_geometry(coords, elems)
    ref_vol = jnp.sum(vol)
    ref_bary = dfm.barycenter(coords, elems, jnp.zeros_like(coords.T))
    sigma = jnp.asarray(0.3)
    scaling = jnp.asarray(1.0)

    # single-device patch reference (UNPADDED patch set)
    struct1 = pmg.PatchMGStructure(ps_raw)
    tabs1 = pmg.make_level_tables(ps_raw, coords.dtype)
    data1 = pmg.assemble_patch_mg(ps_raw, struct1, coords, corner_fn,
                                  base_dense_fn, tabs1)
    pops = PatchOps(struct1, data1, st.to_patch(ps_raw.fine, coords.T))
    st_ref = admm.admm_inner_ops(
        cfg, pops, st.to_patch(ps_raw.fine, Jp_g), sigma, scaling,
        ref_vol, ref_bary,
    )

    # sharded run (PADDED)
    sh = build_sharded_mg(ps_raw, _mesh())
    coords_p = sh.to_patch_sharded(coords.T)
    tabs_sh = sh.make_tables(coords.dtype)
    data_sh = jax.jit(sh.assemble_fn(corner_fn, base_dense_fn))(coords_p, tabs_sh)
    st_sh = jax.jit(sh.admm_inner_fn(cfg))(
        data_sh, coords_p, sh.pvalid(dtype=coords.dtype),
        sh.to_patch_sharded(Jp_g), sigma, scaling, ref_vol, ref_bary,
    )

    assert bool(st_sh.converged) == bool(st_ref.converged)
    assert bool(st_sh.failed) == bool(st_ref.failed)
    assert int(st_sh.admm_it) == int(st_ref.admm_it)
    assert int(st_sh.total_newton) == int(st_ref.total_newton)
    np.testing.assert_allclose(
        np.asarray(st_sh.Lambda), np.asarray(st_ref.Lambda), rtol=1e-6, atol=1e-9
    )
    u_sh = st.from_patch(sh.ps.fine, jnp.asarray(st_sh.u), fine.num_vertices,
                         mode="owner")
    u_rf = st.from_patch(ps_raw.fine, st_ref.u, fine.num_vertices, mode="owner")
    err = float(
        jnp.linalg.norm(u_sh - u_rf) / jnp.maximum(jnp.linalg.norm(u_rf), 1e-30)
    )
    assert err < 1e-6
    np.testing.assert_allclose(
        float(st_sh.u_diff_norm), float(st_ref.u_diff_norm), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(st_sh.max_grad_norm), float(st_ref.max_grad_norm), rtol=1e-6
    )


@pytest.mark.parametrize("dim,refs,rb", [(2, 2, 1), (3, 2, 2)])
@pytest.mark.slow
def test_agglomerated_coarse_levels_match(dim, refs, rb):
    """replicate_below: the agglomerated V-cycle (coarse levels replicated
    on every device; one all-gather at the transition) must produce the
    same assembly and the same CG iterates as the fully-sharded path."""
    hier = _hier(dim, refs)
    ps_raw = build_patchset(hier)
    sh0 = build_sharded_mg(ps_raw, _mesh())
    sh = build_sharded_mg(ps_raw, _mesh(), replicate_below=rb)
    ps = sh.ps
    fine = hier.fine
    coords = jnp.asarray(fine.coords)

    space = P1VectorSpace.build(hier)
    pat0 = space.patterns[0]
    fixed0 = np.asarray(space.fixed[0])

    def base_dense_fn(coords0):
        em0 = deformation_elem_mats(
            coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
        )
        v0 = sparsity.assemble_values(pat0, em0)
        v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
        return jnp.linalg.inv(sparsity.to_dense(pat0, v0))

    corner_fn = lambda c: deformation_corner_mats(c, 1.0, 1.0, 1.0)
    coords_p0 = sh0.to_patch_sharded(coords.T)
    data0 = jax.jit(sh0.assemble_fn(corner_fn, base_dense_fn))(
        coords_p0, sh0.make_tables(coords.dtype)
    )
    coords_p = sh.to_patch_sharded(coords.T)
    data = jax.jit(sh.assemble_fn(corner_fn, base_dense_fn))(
        coords_p, sh.make_tables(coords.dtype)
    )
    for l in range(len(ps.levels)):
        np.testing.assert_allclose(
            np.asarray(data.W[l]), np.asarray(data0.W[l]), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(data.inv_diag[l]), np.asarray(data0.inv_diag[l]),
            atol=1e-12,
        )

    rng = np.random.default_rng(5)
    b_g = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)), coords.dtype)
    b_g = b_g * space.free_mask().astype(coords.dtype)
    b_p = st.to_patch(ps.fine, b_g)

    res0 = jax.jit(sh0.solve_fn(max_iters=40, rel_tol=1e-10))(
        data0, sh0.to_patch_sharded_raw(b_p)
    )
    res = jax.jit(sh.solve_fn(max_iters=40, rel_tol=1e-10))(
        data, sh.to_patch_sharded_raw(b_p)
    )
    assert bool(res.converged)
    assert int(res.iters) == int(res0.iters)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res0.x), atol=1e-9)

    # mixed-precision IR also runs agglomerated
    resir = jax.jit(sh.solve_ir_fn(rel_tol=1e-11))(
        data, sh.to_patch_sharded_raw(b_p)
    )
    assert bool(resir.converged)
