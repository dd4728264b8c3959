"""Double-float arithmetic + mixed-precision iterative refinement.

Validates the TPU path to below-f32 residuals (BASELINE.md north-star
"DoF/s to 1e-8 residual"): error-free transformations (ops.df), the
compensated stencil residual (apply_w_df / exchange_sum_df), and the
cg_ir_p refinement loop - all checked in f32 against f64 ground truth
(conftest enables x64 on CPU precisely for this).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.patches import build_patchset
from admm_optim_tpu.ops import df
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops.deformation import deformation_corner_mats
from admm_optim_tpu.solvers import patch_mg


def _hier(dim, refs):
    lvl0 = (
        geomgen.channel_2d(n_side=(3, 1), diag="fixed")
        if dim == 2
        else geomgen.channel_3d(n_side=(2, 1, 1))
    )
    levels = [lvl0]
    for _ in range(refs):
        levels.append(refine(levels[-1]))
    return Hierarchy(levels)


def test_two_sum_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=1000), jnp.float32) * 10.0 ** rng.integers(
        -3, 3, size=1000
    ).astype(np.float32)
    b = jnp.asarray(rng.normal(size=1000), jnp.float32)
    s, e = df.two_sum(a, b)
    assert s.dtype == jnp.float32
    # s + e == a + b exactly in f64
    lhs = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)
    p, e = df.two_prod(a, b)
    lhs = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    rhs = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(lhs, rhs)


def test_df_add_mul_accuracy():
    rng = np.random.default_rng(1)
    xs = rng.normal(size=64).astype(np.float32)
    acc = df.from_f(jnp.float32(0.0))
    for v in xs:
        acc = df.add_f(acc, jnp.float32(v))
    exact = np.sum(xs.astype(np.float64))
    got = np.float64(acc.hi) + np.float64(acc.lo)
    assert abs(got - exact) <= 1e-12 * max(1.0, abs(exact))


def _setup_patch_problem(dim, refs, dtype):
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    fine = hier.fine
    coords = jnp.asarray(fine.coords, dtype)
    tabs = patch_mg.make_level_tables(ps, dtype)
    struct = patch_mg.PatchMGStructure(ps)
    coords_p = st.to_patch(ps.fine, coords.T)
    lvl_f = ps.fine
    W = st.assemble_w(ps, ps.k, coords_p, lambda c: deformation_corner_mats(c, 1.0, 1.0, 1.0))
    W = st.bake_dirichlet_w(ps, ps.k, W, free=tabs[ps.k].free.astype(dtype))
    return hier, ps, struct, tabs, coords_p, W


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 1)])
def test_apply_w_df_accuracy(dim, refs):
    """DF apply+exchange in f32 must match the f64 stencil to ~1e-12
    relative, far beyond the ~1e-7 of the plain f32 path."""
    hier, ps, struct, tabs, coords_p, W32 = _setup_patch_problem(dim, refs, jnp.float32)
    _, _, _, tabs64, coords_p64, W64 = _setup_patch_problem(dim, refs, jnp.float64)
    lvl = ps.fine
    rng = np.random.default_rng(2)
    xg = rng.normal(size=(dim, hier.fine.num_vertices))
    x64 = st.to_patch(lvl, jnp.asarray(xg, jnp.float64))
    x32 = x64.astype(jnp.float32)
    xlo = (x64 - x32.astype(jnp.float64)).astype(jnp.float32)

    # f64 ground truth of A32 x (same operator entries, wider arithmetic)
    y64 = st.exchange_sum(None, st.apply_w(ps, W32.astype(jnp.float64), x64), tabs64[ps.k])
    # plain f32
    y32 = st.exchange_sum(None, st.apply_w(ps, W32, x32), tabs[ps.k])
    # DF
    yh, yl = st.apply_w_df(ps, W32, x32, xlo)
    yh, yl = st.exchange_sum_df(tabs[ps.k], yh, yl)
    ydf = yh.astype(jnp.float64) + yl.astype(jnp.float64)

    scale = float(jnp.max(jnp.abs(y64)))
    err32 = float(jnp.max(jnp.abs(y32.astype(jnp.float64) - y64))) / scale
    errdf = float(jnp.max(jnp.abs(ydf - y64))) / scale
    assert errdf < 1e-11
    assert errdf < err32 / 50.0  # and genuinely beats plain f32


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 1)])
@pytest.mark.slow
def test_cg_ir_reaches_1em8(dim, refs):
    """cg_ir_p drives the TRUE (f64-evaluated) relative residual of the f32
    system below 1e-8, where the plain f32 CG stalls around 1e-6..1e-7."""
    from admm_optim_tpu.ops import sparsity
    from admm_optim_tpu.ops.deformation import deformation_elem_mats
    from admm_optim_tpu.ops.p1space import P1VectorSpace

    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    fine = hier.fine
    coords = jnp.asarray(fine.coords, jnp.float32)
    space = P1VectorSpace.build(hier)
    pat0 = space.patterns[0]
    fixed0 = np.asarray(space.fixed[0])

    def base_dense_fn(coords0):
        em0 = deformation_elem_mats(
            coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
        )
        v0 = sparsity.assemble_values(pat0, em0)
        v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
        return jnp.linalg.inv(sparsity.to_dense(pat0, v0).astype(jnp.float32))

    struct = patch_mg.PatchMGStructure(ps)
    tabs = patch_mg.make_level_tables(ps, jnp.float32)
    data = patch_mg.assemble_patch_mg(
        ps, struct, coords,
        lambda c: deformation_corner_mats(c, 1.0, 1.0, 1.0),
        base_dense_fn, tabs=tabs,
    )
    lvl = ps.fine
    rng = np.random.default_rng(3)
    bg = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)), jnp.float32)
    bg = bg * space.free_mask().astype(jnp.float32)
    b = st.to_patch(lvl, bg)

    res = patch_mg.cg_ir_p(struct, data, b, rel_tol=1e-9, max_rounds=8,
                           inner_rel=1e-4, inner_iters=60)
    assert bool(res.converged)

    # f64 ground-truth residual of the f32 operator
    tabs64 = patch_mg.make_level_tables(ps, jnp.float64)
    W64 = data.W[ps.k].astype(jnp.float64)
    x64 = res.x_hi.astype(jnp.float64) + res.x_lo.astype(jnp.float64)
    y = st.exchange_sum(None, st.apply_w(ps, W64, x64), tabs64[ps.k])
    free = tabs64[ps.k].free
    r_true = (b.astype(jnp.float64) - y) * free[None]
    rnorm = float(jnp.sqrt(st.owner_dot(None, r_true, r_true, tabs64[ps.k])))
    bnorm = float(jnp.sqrt(st.owner_dot(None, b.astype(jnp.float64), b.astype(jnp.float64), tabs64[ps.k])))
    assert rnorm / bnorm < 2e-9
    # the claimed res_norm is honest (matches f64 evaluation to ~10%)
    assert abs(float(res.res_norm) - rnorm) <= 0.2 * rnorm + 1e-12 * bnorm

    # plain f32 CG cannot get there
    res32 = patch_mg.cg_p(struct, data, b, max_iters=200, rel_tol=1e-9)
    x32 = res32.x.astype(jnp.float64)
    y32 = st.exchange_sum(None, st.apply_w(ps, W64, x32), tabs64[ps.k])
    r32 = (b.astype(jnp.float64) - y32) * free[None]
    r32n = float(jnp.sqrt(st.owner_dot(None, r32, r32, tabs64[ps.k])))
    assert rnorm < r32n / 20.0


def test_exchange_df_spmd_matches():
    """Sharded DF exchange == single-device DF exchange, bitwise."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from admm_optim_tpu.core.patches import pad_patchset
    from admm_optim_tpu.parallel.patch_shard import build_sharded_mg

    hier = _hier(2, 2)
    ps = build_patchset(hier)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("space",))
    sh = build_sharded_mg(ps, mesh)
    ps_pad = sh.ps
    lvl = ps_pad.fine
    rng = np.random.default_rng(4)
    shape = (2,) + lvl.lat_shape + (lvl.P,)
    xh = jnp.asarray(rng.normal(size=shape), jnp.float32)
    xl = jnp.asarray(rng.normal(size=shape) * 1e-7, jnp.float32)
    tab = st.make_tables(lvl, jnp.float32)
    ref_h, ref_l = st.exchange_sum_df(tab, xh, xl)

    fs = sh.field_spec()
    f = jax.jit(
        jax.shard_map(
            lambda t, a, b: st.exchange_sum_df(t, a, b, spmd=sh.spmd),
            mesh=mesh,
            in_specs=(sh.table_specs(ps_pad.k), fs, fs),
            out_specs=(fs, fs),
            check_vma=False,
        )
    )
    tabs_sh = sh.make_tables(jnp.float32)
    got_h, got_l = f(
        tabs_sh[ps_pad.k],
        jax.device_put(xh, NamedSharding(mesh, fs)),
        jax.device_put(xl, NamedSharding(mesh, fs)),
    )
    np.testing.assert_array_equal(np.asarray(ref_h), np.asarray(got_h))
    np.testing.assert_array_equal(np.asarray(ref_l), np.asarray(got_l))


@pytest.mark.slow
def test_bf16_smoother_stream_interpret_mode(monkeypatch):
    """The PRODUCTION bf16 pencil-major smoother stream (smoother_w='auto')
    driven through the interpret-mode kernel on CPU: the stream is
    otherwise TPU-gated and had zero CI coverage (advisor r2).  Forcing the
    gate on must (a) actually build PencilW-tagged W_sm entries, (b) keep
    the V-cycle contracting, and (c) keep cg_ir_p reaching a true 1e-8
    residual - bf16 weight rounding only perturbs the preconditioner, not
    the f32 A-applies or the DF residuals."""
    from admm_optim_tpu.ops import sparsity
    from admm_optim_tpu.ops.deformation import deformation_elem_mats
    from admm_optim_tpu.ops.p1space import P1VectorSpace

    monkeypatch.setattr(patch_mg, "_smoother_stream_on", lambda: True)
    # 5 = this fixture's FINE lattice only: production (lat >= 9) streams
    # bf16 on the traffic-dominant fine levels while coarse levels stay
    # f32 - enabling it on the tiny coarse grids too (e.g. threshold 4)
    # perturbs the coarse corrections enough that CG-IR stalls at ~2e-6,
    # a configuration the production plan never builds
    monkeypatch.setattr(patch_mg, "SMOOTHER_STREAM_MIN_LAT", 5)

    dim, refs = 3, 2
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    fine = hier.fine
    coords = jnp.asarray(fine.coords, jnp.float32)
    space = P1VectorSpace.build(hier)
    pat0 = space.patterns[0]
    fixed0 = np.asarray(space.fixed[0])

    def base_dense_fn(coords0):
        em0 = deformation_elem_mats(
            coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
        )
        v0 = sparsity.assemble_values(pat0, em0)
        v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
        return jnp.linalg.inv(sparsity.to_dense(pat0, v0).astype(jnp.float32))

    struct = patch_mg.PatchMGStructure(ps)  # smoother_w="auto" (default)
    assert patch_mg.smoother_w_plan(struct, ps, jnp.float32) is not None
    tabs = patch_mg.make_level_tables(ps, jnp.float32)
    data = patch_mg.assemble_patch_mg(
        ps, struct, coords,
        lambda c: deformation_corner_mats(c, 1.0, 1.0, 1.0),
        base_dense_fn, tabs=tabs, sym=True,
    )
    # (a) the stream was actually built, tagged, and is bf16
    assert data.W_sm is not None
    fine_sm = data.W_sm[ps.k]
    assert isinstance(fine_sm, st.PencilW)
    assert fine_sm.dtype == jnp.bfloat16

    lvl = ps.fine
    rng = np.random.default_rng(5)
    bg = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)), jnp.float32)
    bg = bg * space.free_mask().astype(jnp.float32)
    b = st.to_patch(lvl, bg)

    # (b) one V-cycle contracts the residual
    x1 = patch_mg.vcycle_p(struct, data, b)
    tabs64 = patch_mg.make_level_tables(ps, jnp.float64)
    W64 = data.W[ps.k].astype(jnp.float64)

    def true_rel_res(x, xlo=None):
        # evaluate DF pairs in f64 WITHOUT collapsing to f32 first
        x64 = x.astype(jnp.float64)
        if xlo is not None:
            x64 = x64 + xlo.astype(jnp.float64)
        y = st.exchange_sum(None, st.apply_w(ps, W64, x64), tabs64[ps.k])
        free = tabs64[ps.k].free
        r = (b.astype(jnp.float64) - y) * free[None]
        rn = float(jnp.sqrt(st.owner_dot(None, r, r, tabs64[ps.k])))
        bn = float(
            jnp.sqrt(
                st.owner_dot(
                    None, b.astype(jnp.float64), b.astype(jnp.float64),
                    tabs64[ps.k],
                )
            )
        )
        return rn / bn

    assert true_rel_res(x1) < 0.5

    # (c) full mixed-precision solve still reaches 1e-8 true residual
    res = patch_mg.cg_ir_p(struct, data, b, rel_tol=1e-9, max_rounds=8,
                           inner_rel=1e-4, inner_iters=60)
    assert bool(res.converged)
    assert true_rel_res(res.x_hi, res.x_lo) < 2e-9


def test_apply_w_df_sym_jit_exact():
    """Regression: the DF apply with SYM-stored W must keep its compensation
    UNDER JIT on the XLA fallback path.  The old sym-specific shifted-
    transpose form silently degraded to plain-f32 accuracy when compiled as
    one XLA:CPU computation (2.4e-8 vs 1.1e-14 value accuracy; barriers at
    every seam could not restore it), stalling cg_ir_p at ~3e-7 - the fix
    expands sym storage to full slots before the XLA DF form."""
    dim, refs = 3, 1
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    fine = hier.fine
    coords = jnp.asarray(fine.coords, jnp.float32)
    tabs = patch_mg.make_level_tables(ps, jnp.float32)
    coords_p = st.to_patch(ps.fine, coords.T)
    free = tabs[ps.k].free.astype(jnp.float32)
    W_sym = st.assemble_w(
        ps, ps.k, coords_p, lambda c: deformation_corner_mats(c, 1.0, 1.0, 1.0),
        sym=True,
    )
    W_sym = st.bake_dirichlet_w(ps, ps.k, W_sym, free=free)
    rng = np.random.default_rng(0)
    xg = rng.normal(size=(dim, fine.num_vertices))
    xh = st.to_patch(ps.fine, jnp.asarray(xg, jnp.float32))
    xl = st.to_patch(ps.fine, jnp.asarray(xg, jnp.float32)) * 1e-8
    x64 = xh.astype(jnp.float64) + xl.astype(jnp.float64)
    y64 = st.apply_w(ps, st.expand_sym_w(ps, W_sym).astype(jnp.float64), x64)
    scale = float(jnp.max(jnp.abs(y64)))

    yh, yl = jax.jit(lambda a, b: st.apply_w_df(ps, W_sym, a, b))(xh, xl)
    yv = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    assert float(jnp.max(jnp.abs(yv - y64))) / scale < 1e-11
