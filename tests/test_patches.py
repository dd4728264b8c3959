"""Brick-patch lattice backend: construction, stencil operator, MG.

Correctness is established against the general block-ELL path on the SAME
hierarchy: the patch representation is an exact isometric image of the
global DoF space, so SpMV results, CG iterates and V-cycle contractions
must agree to roundoff.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.patches import build_patchset
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.deformation import (
    deformation_corner_mats,
    deformation_elem_mats,
)
from admm_optim_tpu.ops.p1space import P1VectorSpace
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


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 2)])
def test_patchset_structure(dim, refs):
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    fine = hier.fine
    lvl = ps.fine
    m1 = 2**refs + 1
    assert lvl.lat_shape == (m1,) * dim
    # every fine vertex is covered, gids valid
    gids = lvl.gid.ravel()
    assert gids.min() >= 0 and gids.max() == fine.num_vertices - 1
    assert len(np.unique(gids)) == fine.num_vertices
    # site coordinates == global coordinates (lattice is exact)
    cp = np.asarray(st.to_patch(lvl, jnp.asarray(fine.coords.T)))  # (d, *lat, P)
    ref = np.moveaxis(fine.coords[lvl.gid], [0, -1], [-1, 0])  # (d, *lat, P)
    assert np.allclose(cp, ref)
    # owner covers each vertex exactly once
    own = np.asarray(lvl.owner).reshape(-1)
    g_sp = np.moveaxis(lvl.gid.reshape(ps.P, -1), 0, 1).reshape(-1)
    counts = np.zeros(fine.num_vertices)
    np.add.at(counts, g_sp, own)
    assert np.allclose(counts, 1.0)
    # element classes and stencil size
    assert len(ps.class_offsets) == (2 if dim == 2 else 6)
    assert len(ps.stencil) == (7 if dim == 2 else 15)


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 1), (3, 2)])
def test_patch_spmv_matches_ell(dim, refs):
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    fine = hier.fine
    space = P1VectorSpace.build(hier)
    pat = space.fine_pattern
    coords = jnp.asarray(fine.coords)
    elems = jnp.asarray(fine.elems)
    c_eps, c_grad, c_mass = 1.0, 2.0, 0.5

    em = deformation_elem_mats(coords, elems, c_eps, c_grad, c_mass)
    vals = sparsity.assemble_values(pat, em)
    vals = sparsity.bake_dirichlet(pat, vals, jnp.asarray(space.fixed[-1]))

    lvl = ps.fine
    coords_p = st.to_patch(lvl, coords.T)
    W = st.assemble_w(
        ps, ps.k, coords_p,
        lambda x: deformation_corner_mats(x, c_eps, c_grad, c_mass),
    )
    W = st.bake_dirichlet_w(ps, ps.k, W)

    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)))
    free_g = space.free_mask().astype(xg.dtype)
    xg = xg * free_g  # free-subspace comparison (identity rows differ)

    y_ell = sparsity.spmv_cn(pat, vals, xg) * free_g
    xp = st.to_patch(lvl, xg)
    yp = st.exchange_sum(lvl, st.apply_w(ps, W, xp))
    y_patch = st.from_patch(lvl, yp, fine.num_vertices, mode="owner")
    assert np.allclose(np.asarray(y_patch), np.asarray(y_ell), atol=1e-11)

    # owner_dot == global dot
    d1 = st.owner_dot(lvl, xp, yp)
    d2 = jnp.vdot(xg, y_ell)
    assert float(abs(d1 - d2)) < 1e-10 * max(1.0, float(abs(d2)))


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 2)])
def test_patch_transfers_match_parents(dim, refs):
    """Prolongation via parity slices == global parent-pair averaging."""
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    rng = np.random.default_rng(1)
    Vc = hier.levels[-2].num_vertices
    Vf = hier.levels[-1].num_vertices
    xc_g = jnp.asarray(rng.normal(size=(dim, Vc)))
    parents = hier.levels[-1].parents
    xf_ref = 0.5 * (
        np.asarray(xc_g)[:, parents[:, 0]] + np.asarray(xc_g)[:, parents[:, 1]]
    )
    xc_p = st.to_patch(ps.levels[-2], xc_g)
    xf_p = st.prolong_p(ps, ps.k - 1, xc_p)
    xf_g = st.from_patch(ps.fine, xf_p, Vf, mode="owner")
    assert np.allclose(np.asarray(xf_g), xf_ref, atol=1e-12)

    # restriction is the exact transpose: <P xc, yf> == <xc, R yf>.
    # R acts on ADDITIVE vectors (UG4 defect storage type): represent the
    # global yf additively by placing all mass on the owning copy.
    yf_g = jnp.asarray(rng.normal(size=(dim, Vf)))
    owner = jnp.asarray(ps.fine.owner, yf_g.dtype)
    yf_p = st.to_patch(ps.fine, yf_g) * owner[None]
    rc_p = st.restrict_p(ps, ps.k - 1, yf_p)
    rc_g = st.from_patch(ps.levels[-2], rc_p, Vc, mode="sum")
    lhs = np.vdot(xf_ref, np.asarray(yf_g))
    rhs = np.vdot(np.asarray(xc_g), np.asarray(rc_g))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


@pytest.mark.parametrize("dim,refs", [(2, 3), (3, 2)])
@pytest.mark.slow
def test_patch_mg_solves(dim, refs):
    """MG-preconditioned CG on the patch backend converges to the same
    solution as the ELL backend, in a comparable iteration count."""
    from admm_optim_tpu.solvers import krylov, mg

    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    fine = hier.fine
    space = P1VectorSpace.build(hier)
    coords = jnp.asarray(fine.coords)
    c_eps, c_grad, c_mass = 1.0, 1.0, 1.0

    # ELL reference solve
    struct_e = space.mg_structure()
    data_e = space.assemble_mg(struct_e, coords, c_eps, c_grad, c_mass)
    rng = np.random.default_rng(2)
    b_g = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)))
    b_g = b_g * space.free_mask().astype(b_g.dtype)
    A = lambda x: sparsity.spmv_flat(space.fine_pattern, data_e.vals[-1], x)
    M = mg.make_preconditioner(struct_e, data_e)
    res_e = krylov.cg(A, b_g.reshape(-1), M=M, max_iters=60, rel_tol=1e-10)
    assert bool(res_e.converged)

    # patch solve
    struct_p = patch_mg.PatchMGStructure(ps)
    pat0 = space.patterns[0]
    fixed0 = jnp.asarray(space.fixed[0])

    def base_dense_fn(coords0):
        em0 = deformation_elem_mats(
            coords0, jnp.asarray(hier.levels[0].elems), c_eps, c_grad, c_mass
        )
        v0 = sparsity.assemble_values(pat0, em0)
        v0 = sparsity.bake_dirichlet(pat0, v0, fixed0)
        return jnp.linalg.inv(sparsity.to_dense(pat0, v0))

    tabs = patch_mg.make_level_tables(ps, coords.dtype)
    data_p = patch_mg.assemble_patch_mg(
        ps, struct_p, coords,
        lambda x: deformation_corner_mats(x, c_eps, c_grad, c_mass),
        base_dense_fn,
        tabs=tabs,
    )
    b_p = st.to_patch(ps.fine, b_g)
    res_p = patch_mg.cg_p(struct_p, data_p, b_p, max_iters=60, rel_tol=1e-10)
    assert bool(res_p.converged)
    x_g = st.from_patch(ps.fine, res_p.x, fine.num_vertices, mode="owner")
    err = np.linalg.norm(np.asarray(x_g).ravel() - np.asarray(res_e.x)) / np.linalg.norm(
        np.asarray(res_e.x)
    )
    assert err < 1e-8
    # iteration counts comparable (same algorithm, same spectra)
    assert abs(int(res_p.iters) - int(res_e.iters)) <= 2


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 2)])
def test_expand_sym_w_matches_full(dim, refs):
    """sym assembly + expand_sym_w == direct full-stencil assembly."""
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    coords_p = st.to_patch(ps.fine, jnp.asarray(hier.fine.coords.T))
    fn = lambda x: deformation_corner_mats(x, 1.0, 2.0, 0.5)
    W_full = st.assemble_w(ps, ps.k, coords_p, fn)
    W_sym = st.assemble_w(ps, ps.k, coords_p, fn, sym=True)
    W_exp = st.expand_sym_w(ps, W_sym)
    assert W_exp.shape == W_full.shape
    assert np.allclose(np.asarray(W_exp), np.asarray(W_full), atol=1e-12)


def test_pallas_apply_interpret_matches_xla():
    """The Pallas pencil kernel (interpret mode on CPU) == XLA apply_w."""
    from admm_optim_tpu.ops import pallas_stencil as pst

    hier = _hier(3, 2)
    ps = build_patchset(hier)
    lvl = ps.fine
    P = lvl.gid.shape[0]
    lat = lvl.lat_shape
    O, C = len(ps.stencil), 3
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(O, C, C) + lat + (P,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + lat + (P,)), jnp.float32)
    y_ref = st.apply_w(ps, W, x)
    stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
    y_pal = pst._apply_w_pallas_3d.__wrapped__(stencil, 5, W, x, interpret=True)
    assert np.allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-4)


def test_pallas_apply_sym_interpret_matches_xla():
    """The sym-storage Pallas kernel (interpret mode) == XLA apply_w on the
    expanded full stencil."""
    from admm_optim_tpu.ops import pallas_stencil as pst

    hier = _hier(3, 2)
    ps = build_patchset(hier)
    lvl = ps.fine
    P = lvl.gid.shape[0]
    lat = lvl.lat_shape
    C = 3
    coords_p = st.to_patch(lvl, jnp.asarray(hier.fine.coords.T))
    fn = lambda x: deformation_corner_mats(x, 1.0, 2.0, 0.5)
    W_sym = jnp.asarray(st.assemble_w(ps, ps.k, coords_p, fn, sym=True), jnp.float32)
    W_full = jnp.asarray(st.expand_sym_w(ps, W_sym), jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(C,) + lat + (P,)), jnp.float32)
    y_ref = st.apply_w(ps, W_full, x)
    stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
    kept = tuple(st.half_slots(ps))
    y_pal = pst._apply_w_pallas_3d_sym.__wrapped__(
        stencil, kept, 4, W_sym, x, interpret=True
    )
    assert np.allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-4)


def test_pallas_apply_df_sym_interpret_matches_f64():
    """Structural check of the double-float sym Pallas kernel (interpret
    mode): slot selection, o2 row shifts, and transpose-pair W indexing all
    match the f64 ground truth to f32 accuracy.  Interpret mode CANNOT
    validate the O(eps^2) compensation — it lowers to XLA ops without the
    optimization barriers, so XLA folds the EFT identities (exactly why the
    kernel exists: Mosaic doesn't).  The precision bar (rel ~1e-13 vs f64,
    measured 8.4e-14) is checked on real TPU by
    scripts/perf/dfkernel_check.py."""
    from admm_optim_tpu.ops import pallas_stencil as pst

    hier = _hier(3, 2)
    ps = build_patchset(hier)
    lvl = ps.fine
    P = lvl.gid.shape[0]
    lat = lvl.lat_shape
    C = 3
    coords_p = st.to_patch(lvl, jnp.asarray(hier.fine.coords.T))
    fn = lambda x: deformation_corner_mats(x, 1.0, 2.0, 0.5)
    W_sym = jnp.asarray(st.assemble_w(ps, ps.k, coords_p, fn, sym=True), jnp.float32)
    rng = np.random.default_rng(2)
    x64 = rng.normal(size=(C,) + lat + (P,))
    xh = jnp.asarray(x64, jnp.float32)
    xl = jnp.asarray(x64 - np.asarray(xh, np.float64), jnp.float32)
    stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
    kept = tuple(st.half_slots(ps))
    yh, yl = pst._apply_w_df_pallas_3d_sym.__wrapped__(
        stencil, kept, 4, W_sym, xh, xl, interpret=True
    )
    y_pal = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    # f64 ground truth on the expanded full stencil
    W64 = jnp.asarray(st.expand_sym_w(ps, W_sym), jnp.float64)
    y_ref = np.asarray(st.apply_w(ps, W64, jnp.asarray(x64)))
    scale = np.abs(y_ref).max()
    # f32-grade agreement proves the kernel applies the right W entries;
    # a slot/shift/transpose bug would show as O(1) errors
    assert np.abs(y_pal - y_ref).max() / scale < 1e-5


@pytest.mark.parametrize("dim,refs", [(2, 2), (3, 2)])
def test_exchange_fast_paths_match_gather_fallbacks(dim, refs, monkeypatch):
    """The roll-based face fetch, edge-line correction write-back, and
    face-slab DF write-back must agree exactly with the generic gather
    fallbacks they replace (which remain live for non-brick adjacency)."""
    hier = _hier(dim, refs)
    ps = build_patchset(hier)
    lvl = ps.fine
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(dim,) + lvl.lat_shape + (lvl.P,)))
    xh = x.astype(jnp.float32)
    xl = jnp.asarray(rng.normal(size=x.shape), jnp.float32) * 1e-8

    tab_fast = st.make_tables(lvl, x.dtype)
    assert tab_fast.face_deltas is not None  # brick meshes take the rolls
    assert tab_fast.corr_edge_keys is not None or lvl.corr_nseg == 0
    assert tab_fast.dfg_face_slot is not None or lvl.nseg == 0

    orig_dfg = st._df_group_tables

    def dfg_dense_only(l):
        sizes, bidx, face, dense = orig_dfg(l)
        if face is not None:
            # rebuild the dense inverse map from the face maps
            lat, P = l.lat_shape, l.P
            d = np.zeros(lat + (P,), np.int32)
            for f, sm in enumerate(face):
                a, sd = f // 2, f % 2
                sl = [slice(None)] * (len(lat) + 1)
                sl[a] = 0 if sd == 0 else lat[a] - 1
                cur = d[tuple(sl)]
                d[tuple(sl)] = np.where(np.asarray(sm) > 0, np.asarray(sm), cur)
            face, dense = None, d
        return sizes, bidx, face, dense

    monkeypatch.setattr(st, "_MAX_FACE_DELTAS", 0)  # kill the roll path
    monkeypatch.setattr(st, "_corr_edge_tables", lambda l: (None, None))
    monkeypatch.setattr(st, "_df_group_tables", dfg_dense_only)
    tab_slow = st.make_tables(lvl, x.dtype)
    assert tab_slow.face_deltas is None
    assert tab_slow.corr_edge_slot is None
    assert tab_slow.dfg_face_slot is None and (
        tab_slow.dfg_slot is not None or lvl.nseg == 0
    )

    y_fast = st.exchange_sum(lvl, x, tab=tab_fast)
    y_slow = st.exchange_sum(lvl, x, tab=tab_slow)
    assert np.array_equal(np.asarray(y_fast), np.asarray(y_slow))

    fh, fl = st.exchange_sum_df(tab_fast, xh, xl)
    sh_, sl_ = st.exchange_sum_df(tab_slow, xh, xl)
    assert np.array_equal(np.asarray(fh), np.asarray(sh_))
    assert np.array_equal(np.asarray(fl), np.asarray(sl_))


def test_pc_layout_apply_and_vjp_match_xla():
    """Pencil-major layout: to_pencil_major (full + sym expansion),
    apply_w_pc (interpret mode), and its custom vjp (= transposed apply)
    all match the XLA slot-major reference."""
    import jax

    from admm_optim_tpu.ops import pallas_stencil as pst

    hier = _hier(3, 1)
    ps = build_patchset(hier)
    lvl = ps.fine
    P = lvl.gid.shape[0]
    lat = lvl.lat_shape
    C, O = 3, len(ps.stencil)
    rng = np.random.default_rng(2)
    W = jnp.asarray(rng.normal(size=(O, C, C) + lat + (P,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(C,) + lat + (P,)), jnp.float32)

    W_pc = pst.to_pencil_major(ps, W)
    y_ref = st.apply_w(ps, W, x)
    y_pc = pst.apply_w_pc(ps, W_pc, x)
    nref = float(jnp.linalg.norm(y_ref.ravel()))
    assert float(jnp.linalg.norm((y_pc - y_ref).ravel())) < 1e-5 * nref

    # sym-expansion path == expand_sym_w + pencil transform
    coords_p = st.to_patch(lvl, jnp.asarray(hier.fine.coords.T))
    fn = lambda c: deformation_corner_mats(c, 1.0, 2.0, 0.5)
    W_sym = jnp.asarray(st.assemble_w(ps, ps.k, coords_p, fn, sym=True), jnp.float32)
    W_full = jnp.asarray(st.expand_sym_w(ps, W_sym), jnp.float32)
    pc_a = pst.to_pencil_major(ps, W_sym)
    pc_b = pst.to_pencil_major(ps, W_full)
    # wrapped roll entries may differ where the apply's zero halo
    # annihilates them; compare through the operator action instead
    ya = pst.apply_w_pc(ps, pc_a, x)
    yb = pst.apply_w_pc(ps, pc_b, x)
    assert float(jnp.linalg.norm((ya - yb).ravel())) < 1e-5 * max(
        float(jnp.linalg.norm(yb.ravel())), 1e-30
    )

    # custom vjp == vjp of the XLA apply (reverse-mode through the kernel)
    g = jnp.asarray(rng.normal(size=y_ref.shape), jnp.float32)
    _, vjp_pc = jax.vjp(lambda xx: pst.apply_w_pc(ps, W_pc, xx), x)
    (xbar,) = vjp_pc(g)
    _, vjp_ref = jax.vjp(lambda xx: st.apply_w(ps, W, xx), x)
    (xbar_ref,) = vjp_ref(g)
    nrefb = float(jnp.linalg.norm(xbar_ref.ravel()))
    assert float(jnp.linalg.norm((xbar - xbar_ref).ravel())) < 1e-5 * nrefb
