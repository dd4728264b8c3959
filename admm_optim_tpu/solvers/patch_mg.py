"""Geometric multigrid on brick-patch lattices (the TPU fast path).

Same algorithm as solvers.mg (Chebyshev-smoothed V-cycle, dense MXU base
solve - replacing the reference's GS-smoothed GMG + SuperLU,
obstacle_optim_util.lua:16-32) but on the patch-stencil representation
(ops.patchstencil): all level operations are static-slice stencil ops, and
the only irregular work is the small boundary-consistency exchange per
operator application.  Iterate-for-iterate equivalent to the block-ELL MG:
the duplicated patch space with owner-weighted inner products is an exact
isometric image of the global DoF space.

All per-level exchange/ownership tables travel as pytree ARGUMENTS
(ops.patchstencil.LevelTables) rather than baked constants - embedding
them in the HLO made compiles minutes-slow and defeated the persistent
compilation cache.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.patches import PatchSet
from ..ops import patchstencil as st


@dataclasses.dataclass(frozen=True)
class PatchMGStructure:
    ps: PatchSet
    pre_smooth: int = 3
    post_smooth: int = 3
    cheb_lower: float = 0.25
    # "chebyshev" (SPD operators) | "jacobi" (nonsymmetric, e.g. the NS
    # convection-diffusion preconditioner operators - Chebyshev assumes a
    # real spectrum; mirrors solvers.mg.MGStructure.smoother)
    smoother: str = "chebyshev"
    # set (parallel.patch_shard) to run the whole cycle inside shard_map
    # with the patch axis sharded: exchanges become halo all-gathers, dots
    # become psums, the base solve psum-gathers to a replicated dense solve
    spmd: st.SpmdCtx | None = None
    # level-wise device agglomeration (the reference's process-hierarchy
    # coarse-grid agglomeration, 2d_admm.lua:174-206): under spmd, levels
    # l < replicate_below carry FULL patch arrays replicated on every
    # device - one all-gather at the restriction transition replaces all
    # per-sweep halo collectives on the latency-bound coarse levels.
    # 0 = only the level-0 dense base solve is gathered (always the case).
    replicate_below: int = 0
    # smoother-stream W precision: "auto" stores an ADDITIONAL bf16
    # pencil-major copy of each 3D level's stencil on TPU and smooths with
    # it (the V-cycle is a preconditioner, so bf16 weight rounding only
    # perturbs M; A-applies and DF residuals keep the f32 sym W).  Measured
    # refs=4 v5e: smoother apply 1.84 -> 1.22 ms at the ~400 GB/s
    # machine-achievable HBM ceiling.  "f32" disables.
    smoother_w: str = "auto"  # "auto" | "f32"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PatchMGData:
    """Device data per level (a pytree, jit-friendly)."""

    W: list  # per level: (O, C, C, *lat, P) slot-major baked stencils
    inv_diag: list  # per level: (C, *lat, P) consistent 1/diag (1 at fixed)
    lmax: list  # per level scalar
    base_inv: Any  # dense inverse of the level-0 global operator (C*V0 sq)
    tabs: list  # per level: st.LevelTables
    # optional per-level smoother-stream stencils (bf16 pencil-major on
    # TPU; None entries fall back to W) - see PatchMGStructure.smoother_w
    W_sm: list | None = None

    def tree_flatten(self):
        return (
            (self.W, self.inv_diag, self.lmax, self.base_inv, self.tabs,
             self.W_sm),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def smoother_W(self, l):
        if self.W_sm is None or self.W_sm[l] is None:
            return self.W[l]
        return self.W_sm[l]


def _apply(ps, tab, W, x, spmd=None):
    """exchange(A x) restricted to the free subspace."""
    y = st.exchange_sum(None, st.apply_w(ps, W, x), tab, spmd=spmd)
    return y * tab.free[None].astype(x.dtype)


def _lmax_init(tab, shape, dtype, spmd=None):
    """Deterministic start vector, a function of GLOBAL flat index so the
    sharded and single-device paths produce identical iterates."""
    C = shape[0]
    lat = shape[1:-1]
    Pl = shape[-1]
    P = tab.P_total if tab.P_total else Pl
    S = int(np.prod(lat))
    off = st._shard_offset(tab, Pl, spmd) if spmd is not None else 0
    c_i = jnp.arange(C).reshape((C,) + (1,) * (len(lat) + 1))
    s_i = jnp.arange(S).reshape((1,) + tuple(lat) + (1,))
    p_i = (jnp.arange(Pl) + off).reshape((1,) * (len(lat) + 1) + (Pl,))
    flat = ((c_i * S + s_i) * P + p_i).astype(dtype)
    return jnp.sin(flat) + 1.0


def estimate_lmax_p(ps, tab, W, inv_diag, iters: int = 15, spmd=None):
    """Power iteration for lambda_max(D^-1 A) with owner-weighted norms."""
    x = _lmax_init(tab, inv_diag.shape, W.dtype, spmd)
    x = st.exchange_sum(None, x, tab, spmd=spmd) * tab.free[None].astype(x.dtype)

    def body(i, x):
        y = inv_diag * _apply(ps, tab, W, x, spmd)
        return y / jnp.maximum(
            jnp.sqrt(st.owner_dot(None, y, y, tab, spmd=spmd)), 1e-30
        )

    x = jax.lax.fori_loop(
        0,
        iters,
        body,
        x / jnp.maximum(jnp.sqrt(st.owner_dot(None, x, x, tab, spmd=spmd)), 1e-30),
    )
    y = inv_diag * _apply(ps, tab, W, x, spmd)
    return (
        st.owner_dot(None, x, y, tab, spmd=spmd)
        / st.owner_dot(None, x, x, tab, spmd=spmd)
        * 1.1
    )


def make_level_tables(ps: PatchSet, dtype=jnp.float32, nshards: int | None = None):
    """Device tables for every level (do this OUTSIDE jit, once).  nshards
    (sharded path) enables the static point-to-point halo-delta tables."""
    return [st.make_tables(lvl, dtype, nshards=nshards) for lvl in ps.levels]


def vcycle_cost_table(
    struct: PatchMGStructure, data: PatchMGData, hbm_gbps: float = 819.0
) -> str:
    """Per-level V-cycle cost table (the reference's ProfileLUA cost
    accounting analogue, 2d_admm.lua:14): exact HBM bytes + flops per level
    per cycle from the assembled stencil shapes, with a bandwidth-roofline
    time estimate.  hbm_gbps defaults to a v5e chip (~819 GB/s).

    Per level: (pre+post) Chebyshev smoothing degrees + 1 residual apply,
    each apply streaming W once plus x/y; transfers are C*S*P each and
    negligible.  Sym-stored levels stream half the W bytes at full-stencil
    flops (patchstencil.half_slots)."""
    rows = []
    tot_gb = tot_gf = 0.0
    n_apply = struct.pre_smooth + struct.post_smooth + 1
    for l, W in enumerate(data.W):
        if W.ndim >= 5:
            O, C = W.shape[0], W.shape[1]
            lat = W.shape[3:-1]
            P = W.shape[-1]
        else:  # pragma: no cover - defensive
            continue
        S = int(np.prod(lat)) if lat else 1
        b = W.dtype.itemsize
        sym = O < len(struct.ps.stencil)
        O_full = len(struct.ps.stencil)
        w_bytes = O * C * C * S * P * b
        xy_bytes = 2 * C * S * P * b
        gb = n_apply * (w_bytes + xy_bytes) / 1e9
        gf = n_apply * 2.0 * O_full * C * C * S * P / 1e9
        tot_gb += gb
        tot_gf += gf
        rows.append(
            (l, "x".join(map(str, lat)), P, C, O, "sym" if sym else "full",
             w_bytes / 2**20, gb, gf, gb / hbm_gbps * 1e3)
        )
    hdr = (
        f"{'lvl':>3} {'lat':>12} {'P':>6} {'C':>2} {'O':>3} {'store':>5} "
        f"{'W[MiB]':>9} {'GB/cyc':>8} {'GF/cyc':>8} {'roofln[ms]':>10}"
    )
    lines = [hdr]
    for r in rows:
        lines.append(
            f"{r[0]:>3} {r[1]:>12} {r[2]:>6} {r[3]:>2} {r[4]:>3} {r[5]:>5} "
            f"{r[6]:>9.2f} {r[7]:>8.4f} {r[8]:>8.3f} {r[9]:>10.3f}"
        )
    lines.append(
        f"total: {tot_gb:.4f} GB, {tot_gf:.3f} GFLOP per V-cycle; "
        f"roofline {tot_gb / hbm_gbps * 1e3:.3f} ms @ {hbm_gbps:.0f} GB/s"
    )
    return "\n".join(lines)


def assemble_patch_mg_p(
    ps: PatchSet,
    struct: PatchMGStructure,
    coords_p: jnp.ndarray,  # (d, *latf, P[_local]) fine lattice coordinates
    corner_mat_fn: Callable,  # corners (d, nl, ...) -> (C,C,nl,nl,...)
    base_dense_fn: Callable,  # coords0 (V0, d) -> dense inverse (C*V0, C*V0)
    tabs: list,
    sym: bool = False,  # symmetric half-stencil ASSEMBLY (SPD operators only)
    keep_sym: bool = True,  # keep half-stencil storage (halved HBM); the
    # Pallas sym kernel applies it at full-stencil speed via shifted
    # transpose block fetches.  keep_sym=False expands to full slot-major
    # form (expand_sym_w) - faster XLA fallback apply, but the expansion
    # transient (sym + full + stack) OOMed one chip at 3D refs=5
) -> PatchMGData:
    """Assemble all levels from patch-layout geometry (rap=true analogue:
    rediscretized coarse operators from the nested lattice coordinates).
    Runs unchanged inside shard_map when struct.spmd is set: assembly is
    patch-local, the diagonal exchange/lmax use the halo primitives, and
    the base operator is built from the psum-gathered level-0 coordinates
    (V0 is small: the coarse .ugx / geomgen mesh)."""
    spmd = struct.spmd
    nch = coords_p.shape[0]  # input channels (d, or 2d with a frozen field)
    W_l, invd_l, lmax_l = [], [], []
    for l, lvl in enumerate(ps.levels):
        stride = 2 ** (ps.k - l)
        sl = (slice(None),) + tuple(
            slice(0, None, stride) for _ in range(ps.dim)
        )
        cp = coords_p[sl]
        # agglomerated coarse level: every device assembles the FULL level
        # from the all-gathered coarse coordinates (tiny) so the V-cycle
        # below replicate_below runs without further collectives
        lvl_spmd = spmd
        if spmd is not None and l < struct.replicate_below:
            cp = jax.lax.all_gather(cp, spmd.axis, axis=cp.ndim - 1, tiled=True)
            lvl_spmd = None
        # bound per-class assembly temporaries.  Block-protocol corner fns
        # (fn.block_protocol, e.g. deformation_corner_block_fn) keep live
        # temporaries at O(nl*d) lattice units and assemble unchunked; the
        # dense-tensor protocol materializes (C,C,nl,nl,m^d,P) per class and
        # OOMs one chip at 3D refs=5, so it is lax.map-chunked over the patch
        # axis - but never below 112 patches: the patch axis is the TPU lane
        # (minor) dim and smaller chunks pad to 128 lanes (measured 4x memory
        # blowup of the stacked chunk outputs at Pc=14).
        nl = ps.dim + 1
        if getattr(corner_mat_fn, "block_protocol", False):
            p_chunk = None
            # the block path assembles in one fusion whose liveness is
            # ~1.7 KB/cell (measured, 3D refs=5); chunk the first lattice
            # axis (sublane dim, no lane padding) to keep it under ~2.5 GB
            cells = (lvl.m ** ps.dim) * cp.shape[-1]  # cp is the local shard
            nb_rows = max(1, int(np.ceil(cells * 1700 / (2.5 * 2**30))))
            row_chunk = lvl.m
            while row_chunk > 1 and lvl.m // row_chunk < nb_rows:
                row_chunk //= 2
            row_chunk = row_chunk if row_chunk < lvl.m else None
        else:
            row_chunk = None
            bytes_per_patch = (nch * nch * nl * nl) * (lvl.m ** ps.dim) * 4
            p_chunk = max(112, (512 << 20) // max(bytes_per_patch, 1))
            p_chunk = p_chunk if p_chunk < cp.shape[-1] else None
        # tabs of agglomerated levels are replicated full-size (parallel.
        # patch_shard.table_specs), matching the all-gathered cp - no gather
        free_l = tabs[l].free.astype(cp.dtype)
        W = st.assemble_w(
            ps, l, cp, corner_mat_fn, p_chunk=p_chunk, sym=sym, free=free_l,
            row_chunk=row_chunk,
        )
        if sym and not keep_sym:
            W = st.expand_sym_w(ps, W)
        diag = st.exchange_sum(
            None, st.stencil_diag(ps, l, W), tabs[l], spmd=lvl_spmd
        )
        free = tabs[l].free.astype(W.dtype)
        diag = jnp.where(free[None] > 0, diag, 1.0)
        inv_diag = 1.0 / diag
        W_l.append(W)
        invd_l.append(inv_diag)
        lmax_l.append(estimate_lmax_p(ps, tabs[l], W, inv_diag, spmd=lvl_spmd))
    V0 = int(ps.levels[0].gid.max()) + 1
    sl0 = (slice(None),) + tuple(
        slice(0, None, 2**ps.k) for _ in range(ps.dim)
    )
    cp0 = coords_p[sl0]
    if spmd is not None and struct.replicate_below > 0:
        # tabs[0] is full/replicated under agglomeration
        cp0 = jax.lax.all_gather(cp0, spmd.axis, axis=cp0.ndim - 1, tiled=True)
        coords0 = st.from_patch_tab(tabs[0], cp0, V0, spmd=None)
    else:
        coords0 = st.from_patch_tab(tabs[0], cp0, V0, spmd=spmd)  # (d, V0)
    base_inv = base_dense_fn(coords0.T)
    # bf16 pencil-major smoother copies for the traffic-dominant levels
    # (struct.smoother_w docstring)
    plan = smoother_w_plan(struct, ps, coords_p.dtype)
    W_sm = None
    if plan is not None:
        from ..ops import pallas_stencil as pst

        W_sm = [
            st.PencilW(pst.to_pencil_major(ps, W, jnp.bfloat16))
            if on
            else None
            for on, W in zip(plan, W_l)
        ]
    return PatchMGData(W_l, invd_l, lmax_l, base_inv, tabs, W_sm)


# minimum lattice edge for the bf16 smoother stream (below this the W
# streaming win is dominated by kernel-launch overhead); module-level so
# tests can lower it and drive the stream at CPU-interpret sizes
SMOOTHER_STREAM_MIN_LAT = 9


def _smoother_stream_on() -> bool:
    """Backend gate for the bf16 pencil-major smoother stream.  Separate
    function so the CPU test lane can monkeypatch it and exercise the
    production stream through the interpret-mode kernel (the stream is
    otherwise TPU-only and would have zero CI coverage)."""
    return jax.default_backend() == "tpu"


def smoother_w_plan(struct: PatchMGStructure, ps: PatchSet, dtype):
    """Which levels carry a bf16 pencil-major smoother stencil (None =
    feature off).  Shared by assembly and parallel.patch_shard.data_specs
    so the sharded pytree specs match the assembled data structure."""
    if not (
        struct.smoother_w == "auto"
        and ps.dim == 3
        and _smoother_stream_on()
        and dtype == jnp.float32
    ):
        return None
    plan = [min(lvl.lat_shape) >= SMOOTHER_STREAM_MIN_LAT for lvl in ps.levels]
    return plan if any(plan) else None


def assemble_patch_mg(
    ps: PatchSet,
    struct: PatchMGStructure,
    coords_global: jnp.ndarray,  # (V, d) current fine-mesh coordinates
    corner_mat_fn: Callable,
    base_dense_fn: Callable,
    tabs: list | None = None,
    sym: bool = False,
    keep_sym: bool = True,
) -> PatchMGData:
    """Single-device wrapper: global coords -> patch layout -> assemble."""
    if tabs is None:
        tabs = make_level_tables(ps, coords_global.dtype)
    coords_p = st.to_patch(ps.fine, coords_global.T)  # (d, *latf, P)
    return assemble_patch_mg_p(
        ps, struct, coords_p, corner_mat_fn, base_dense_fn, tabs, sym=sym,
        keep_sym=keep_sym,
    )


def chebyshev_smooth_p(
    ps, tab, W, inv_diag, lmax, x, b, degree, lower, spmd=None,
    x_is_zero: bool = False,
):
    """Chebyshev iteration (see solvers.mg.chebyshev_smooth) on patch arrays;
    x, b consistent.  x_is_zero (static): skip the first stencil apply
    (A.0 = 0, so r = b exactly) - the V-cycle always enters pre-smoothing
    with a zero iterate, making this one free fine-level apply per cycle
    (~10% of cycle wall, measured refs=4)."""
    lmin = lower * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    free = tab.free[None].astype(x.dtype)

    r = b * free if x_is_zero else (b - _apply(ps, tab, W, x, spmd)) * free
    z = inv_diag * r
    d_vec = z / theta
    x = x + d_vec
    # rho_0 = delta/theta seeds the Chebyshev rho-recurrence (Saad Alg.
    # 12.1).  Seeding with sigma_1 = theta/delta instead makes the first
    # recurrence coefficient rho_1*rho_0 = 1 and the realized polynomial is
    # NOT the Chebyshev one: measured error factors 1.00/0.43 (deg 2/3) vs
    # the optimal 0.22/0.074 on [0.25, 1] - degree 2 didn't damp at all.
    sigma_old = delta / theta if degree > 1 else 1.0

    def body(i, carry):
        x, d_vec, sigma_old = carry
        r = (b - _apply(ps, tab, W, x, spmd)) * free
        z = inv_diag * r
        sigma_new = 1.0 / (2.0 * theta / delta - sigma_old)
        d_vec = (2.0 * sigma_new / delta) * z + (sigma_new * sigma_old) * d_vec
        return (x + d_vec, d_vec, sigma_new)

    if degree > 1:
        x, _, _ = jax.lax.fori_loop(0, degree - 1, body, (x, d_vec, sigma_old))
    return x


def jacobi_smooth_p(
    ps, tab, W, inv_diag, lmax, x, b, degree, omega=0.7, spmd=None,
    x_is_zero: bool = False,
):
    """Damped Jacobi on patch arrays (see solvers.mg.jacobi_smooth): safe for
    nonsymmetric operators; damping scaled by the power-iteration bound.
    x_is_zero: as in chebyshev_smooth_p (first apply skipped exactly)."""
    free = tab.free[None].astype(x.dtype)
    scale = omega / jnp.maximum(lmax, 1e-30)

    def body(i, x):
        r = (b - _apply(ps, tab, W, x, spmd)) * free
        return x + scale * (inv_diag * r)

    if x_is_zero and degree >= 1:
        x = x + scale * (inv_diag * (b * free))
        return jax.lax.fori_loop(0, degree - 1, body, x)
    return jax.lax.fori_loop(0, degree, body, x)


def vcycle_p(struct: PatchMGStructure, data: PatchMGData, b, x0=None):
    """One V(pre,post)-cycle; b, x (C, *latf, P) consistent, free-masked.

    Under spmd, levels l < struct.replicate_below run agglomerated: the
    restriction into the topmost replicated level all-gathers the additive
    residual once, everything below is redundantly-replicated single-device
    arithmetic (bit-identical across devices), and the prolongation slices
    the local patch block back out."""
    ps = struct.ps
    L = ps.k

    spmd = struct.spmd
    RB = struct.replicate_below if spmd is not None else 0

    if struct.smoother == "jacobi":
        smooth = lambda ps_, tab, W, invd, lm, x, b, deg, sp, xz=False: (
            jacobi_smooth_p(ps_, tab, W, invd, lm, x, b, deg, spmd=sp,
                            x_is_zero=xz)
        )
    else:
        smooth = lambda ps_, tab, W, invd, lm, x, b, deg, sp, xz=False: (
            chebyshev_smooth_p(ps_, tab, W, invd, lm, x, b, deg,
                               struct.cheb_lower, sp, x_is_zero=xz)
        )

    def solve_level(l, b_l, x_l, x_zero=False):
        # b_l, x_l are FULL patch arrays when l < RB, local shards otherwise
        lvl_spmd = spmd if l >= RB else None
        lvl = ps.levels[l]
        tab = data.tabs[l]
        if l == 0:
            # gathered dense base solve (SuperLU analogue): consistent
            # residual -> owner-picked global (psum-gathered under spmd,
            # the reference's gatheredBaseSolverIfAmbiguous) -> dense
            # inverse -> patch
            C = b_l.shape[0]
            V0 = data.base_inv.shape[0] // C
            bg = st.from_patch_tab(tab, b_l, V0, mode="owner", spmd=lvl_spmd)
            xg = (data.base_inv @ bg.reshape(-1)).reshape(C, V0)
            return st.to_patch_tab(tab, xg)
        x_l = smooth(
            ps, tab, data.smoother_W(l), data.inv_diag[l], data.lmax[l],
            x_l, b_l, struct.pre_smooth, lvl_spmd, x_zero,
        )
        # restriction acts on the ADDITIVE residual (UG4 storage-type rule:
        # defects are additive, 2d_admm.lua:958): owner-weighted b minus the
        # raw per-patch partial sums - restricting a consistent vector would
        # double-count duplicated sites
        owner = tab.owner.astype(b_l.dtype)
        r_add = b_l * owner[None] - st.apply_w(ps, data.smoother_W(l), x_l)
        rc = st.restrict_p(ps, l - 1, r_add)
        tab_c = data.tabs[l - 1]
        agglom_edge = spmd is not None and l >= RB and (l - 1) < RB
        if agglom_edge:
            # one collective replaces all coarse-level halo traffic
            rc = jax.lax.all_gather(rc, spmd.axis, axis=rc.ndim - 1, tiled=True)
        rc_spmd = spmd if (l - 1) >= RB else None
        rc = st.exchange_sum(None, rc, tab_c, spmd=rc_spmd) * tab_c.free[
            None
        ].astype(rc.dtype)
        ec = solve_level(l - 1, rc, jnp.zeros_like(rc), x_zero=True)
        if agglom_edge:
            Pl = x_l.shape[-1]
            off = st._shard_offset(tab, Pl, spmd)
            ec = jax.lax.dynamic_slice_in_dim(ec, off, Pl, axis=ec.ndim - 1)
        x_l = x_l + st.prolong_p(ps, l - 1, ec) * tab.free[None].astype(x_l.dtype)
        x_l = smooth(
            ps, tab, data.smoother_W(l), data.inv_diag[l], data.lmax[l],
            x_l, b_l, struct.post_smooth, lvl_spmd,
        )
        return x_l

    x_zero = x0 is None
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return solve_level(L, b, x0, x_zero=x_zero)


def make_preconditioner_p(struct: PatchMGStructure, data: PatchMGData):
    def M(r):
        return vcycle_p(struct, data, r)

    return M


def residual_df(struct: PatchMGStructure, data: PatchMGData, b, xh, xl):
    """r = b - A(xh+xl) as a double-float pair, error-free to O(eps^2):
    compensated stencil products (ops.patchstencil.apply_w_df) + exact
    duplicate exchange (exchange_sum_df).  b is plain working precision
    (exactly representable)."""
    from ..ops import df

    ps = struct.ps
    tab = data.tabs[ps.k]
    yh, yl = st.apply_w_df(ps, data.W[ps.k], xh, xl)
    yh, yl = st.exchange_sum_df(tab, yh, yl, spmd=struct.spmd)
    free = tab.free[None].astype(xh.dtype)
    # cancellation-safe DF subtraction: b - Ax cancels by construction, so
    # the hi part can fall below the lo magnitude (df.add handles it)
    r = df.add(df.from_f(b * free), df.DF(-yh * free, -yl * free))
    return r.hi, r.lo


class IRResult(NamedTuple):
    x_hi: jnp.ndarray
    x_lo: jnp.ndarray
    rounds: jnp.ndarray
    inner_iters: jnp.ndarray
    res_norm: jnp.ndarray  # TRUE relative-to-b residual, DF-evaluated
    converged: jnp.ndarray


def cg_ir_p(
    struct: PatchMGStructure,
    data: PatchMGData,
    b,
    rel_tol: float = 1e-8,
    abs_tol: float = 0.0,
    max_rounds: int = 8,
    inner_rel: float = 1e-4,
    inner_iters: int = 40,
) -> IRResult:
    """Mixed-precision MG solve to below-f32 residuals (the north-star
    "DoF/s to 1e-8" metric, BASELINE.md): double-float iterative refinement
    around the f32 MG-preconditioned CG.

    x is carried as an unevaluated (hi, lo) f32 pair (~48 significand bits);
    each round solves A e = r_hi in plain f32 (all smoothing/Krylov work at
    full TPU speed), updates x in DF, and re-evaluates the defect with
    error-free transformations (residual_df).  Plays the role of the
    reference's f64 BiCGStab at abs 1e-12 (obstacle_optim_util.lua:35-37):
    same true-residual guarantee, without paying emulated-f64 everywhere.

    Note the target is the residual of the ASSEMBLED (f32-rounded) operator;
    per-entry assembly rounding is an eps-sized relative perturbation of A,
    i.e. a backward error at the discretization-coefficient level."""
    from ..ops import df

    ps = struct.ps
    tab = data.tabs[ps.k]
    dot = lambda x, y: st.owner_dot(None, x, y, tab, spmd=struct.spmd)
    bnorm = jnp.sqrt(dot(b, b))
    tol = jnp.maximum(abs_tol, rel_tol * bnorm)

    def cond(state):
        xh, xl, rh, rl, rnorm, rounds, inner = state
        return (rnorm > tol) & (rounds < max_rounds)

    def body(state):
        xh, xl, rh, rl, rnorm, rounds, inner = state
        res = cg_p(
            struct, data, rh, max_iters=inner_iters,
            rel_tol=inner_rel, abs_tol=0.0,
        )
        xh, xl = df.add(df.DF(xh, xl), df.from_f(res.x))
        rh2, rl2 = residual_df(struct, data, b, xh, xl)
        rnorm2 = jnp.sqrt(dot(rh2, rh2))
        return (xh, xl, rh2, rl2, rnorm2, rounds + 1, inner + res.iters)

    z = jnp.zeros_like(b)
    init = (z, z, b, z, bnorm, jnp.array(0, jnp.int32), jnp.array(0, jnp.int32))
    xh, xl, rh, rl, rnorm, rounds, inner = jax.lax.while_loop(cond, body, init)
    return IRResult(xh, xl, rounds, inner, rnorm, rnorm <= tol)


def cg_p(
    struct: PatchMGStructure,
    data: PatchMGData,
    b,
    x0=None,
    max_iters: int = 60,
    abs_tol: float = 0.0,
    rel_tol: float = 1e-8,
):
    """MG-preconditioned CG on the fine patch level (ConvCheck semantics as
    solvers.krylov.cg, owner-weighted inner products)."""
    from . import krylov

    ps = struct.ps
    tab = data.tabs[ps.k]
    A = lambda x: _apply(ps, tab, data.W[ps.k], x, struct.spmd)
    M = make_preconditioner_p(struct, data)
    dot = lambda x, y: st.owner_dot(None, x, y, tab, spmd=struct.spmd)
    return krylov.cg(
        A, b, x0=x0, M=M, max_iters=max_iters, abs_tol=abs_tol, rel_tol=rel_tol,
        dot=dot,
    )
