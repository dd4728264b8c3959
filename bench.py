"""Benchmark driver: one JSON line on stdout.

Measures the framework's hot path (BASELINE.md "Tracked metrics"): the
multigrid-preconditioned x-update solve of the deformation system - DoF/s to
a 1e-8 TRUE relative residual (double-float-verified mixed-precision
iterative refinement, solvers.patch_mg.cg_ir_p) on the largest single-chip
problem that fits the wall budget - using the brick-patch stencil backend
(gather-free SpMV + slab exchange; solvers.patch_mg).  The reference
publishes no numbers (BASELINE.json "published": {}), so vs_baseline is
reported against the first working TPU build of THIS repo (block-ELL
backend, 1e-6 CG, r1): a self-referential progress tracker, not a
reference claim.

Timing methodology: the axon TPU tunnel neither blocks reliably in
block_until_ready nor keeps per-call dispatch cheap (~30-50 ms RTT), so
solves are CHAINED INSIDE one jit (lax.fori_loop) and completion is forced
by fetching a scalar to the host.  The FIRST device->host fetch of a
process pays a one-time ~3-4 min tunnel initialization (measured: a tiny
x+1 fetch costs 172s cold, everything after compiles in ~1s), so a warmup
fetch is fired on a background thread at startup, overlapped with host-side
mesh construction.

All progress goes to stderr; stdout carries exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# measured-work budget, clocked from warmup completion.  BENCH_BUDGET_S
# overrides for cache-warming runs (a cold round needs ~2x the budget in
# compiles alone; a pre-round warming run at a raised budget leaves the
# driver's default-budget run fully cache-hit)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))
WARMUP_CAP_S = 1500.0  # max wait for the one-time tunnel fetch (measured
# cold costs this round: 331-1016 s per process; the budget must not start
# ticking against work the tunnel hasn't allowed yet)
REPS = 5


_best_result = {}  # filled by main; read by the watchdog
_warmup_done = None  # threading.Event set when the first fetch lands
_warmup_t = [None]  # perf_counter() at warmup completion


def _emit(metric, value, vs_baseline):
    print(
        json.dumps(
            {"metric": metric, "value": value, "unit": "dof/s",
             "vs_baseline": vs_baseline}
        ),
        flush=True,
    )


def start_watchdog():
    """Hard stop: emit the best completed result and exit if the larger
    sizes overrun.  The deadline is WARMUP-RELATIVE: the one-time tunnel
    initialization (331-1016 s measured) must not eat the measurement
    budget, so the clock starts when the warmup fetch lands (with a cap in
    case the tunnel never comes up).  A blocked tunnel fetch cannot be
    interrupted by signals, so the watchdog prints from its own thread."""
    import os
    import threading

    def run():
        _warmup_done.wait(WARMUP_CAP_S)
        time.sleep(BUDGET_S + 150.0)
        log("[watchdog] deadline hit; emitting best-so-far")
        if _best_result:
            _emit(**_best_result)
        else:
            _emit("bench_timeout", 0.0, 0.0)
        sys.stdout.flush()
        os._exit(0)

    threading.Thread(target=run, daemon=True).start()


def start_warmup_thread():
    """Trigger the one-time tunnel/fetch initialization concurrently with
    host-side setup (JAX transfers release the GIL while blocking)."""
    import threading

    def warm():
        import jax
        import jax.numpy as jnp

        t0 = time.perf_counter()
        y = jax.jit(lambda x: x + 1.0)(jnp.ones((8,), jnp.float32))
        float(y[0])
        _warmup_t[0] = time.perf_counter()
        log(f"[warmup] first fetch done in {_warmup_t[0] - t0:.1f}s")
        _warmup_done.set()

    th = threading.Thread(target=warm, daemon=True)
    th.start()
    return th


HOST_CACHE_VER = 3  # bump when core.mesh / core.patches layouts change


def get_mesh(num_refs):
    """Host-side hierarchy+patchset, pickle-cached across bench runs (the
    driver re-runs this script every round on a 1-core host where refs=4
    mesh construction costs minutes)."""
    import os
    import pickle

    from admm_optim_tpu.core import geomgen
    from admm_optim_tpu.core.mesh import Hierarchy, refine
    from admm_optim_tpu.core.patches import build_patchset

    cdir = os.path.expanduser("~/.cache/jax_admm")
    os.makedirs(cdir, exist_ok=True)
    path = os.path.join(cdir, f"host_mesh_3d_refs{num_refs}_v{HOST_CACHE_VER}.pkl")
    if os.path.exists(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as f:
                hier, ps = pickle.load(f)
            log(f"host mesh cache hit ({time.perf_counter() - t0:.1f}s)")
            return hier, ps
        except Exception as e:  # noqa: BLE001
            log(f"host mesh cache unreadable ({e!r}); rebuilding")
    levels = [geomgen.channel_3d()]
    for _ in range(num_refs):
        levels.append(refine(levels[-1]))
    hier = Hierarchy(levels)
    ps = build_patchset(hier)
    try:
        with open(path + ".tmp", "wb") as f:
            pickle.dump((hier, ps), f)
        os.replace(path + ".tmp", path)
    except Exception as e:  # noqa: BLE001
        log(f"host mesh cache write failed ({e!r})")
    return hier, ps


def assemble_ctx(num_refs):
    """Host mesh + device assembly only (shared by the solve benchmark and
    the ADMM-throughput phase, so neither holds the other's device arrays
    resident - refs=4 residue OOMed the refs=5 assembly in r2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from admm_optim_tpu.ops import sparsity
    from admm_optim_tpu.ops.deformation import (
        deformation_corner_block_fn,
        deformation_elem_mats,
    )
    from admm_optim_tpu.solvers import patch_mg

    hier, ps = get_mesh(num_refs)
    log(hier.describe())
    fine = hier.fine
    log(
        f"P={ps.P} lat={ps.fine.lat_shape} slots={ps.fine.n_sites} "
        f"(x{ps.fine.n_sites / fine.num_vertices:.2f} duplication)"
    )
    coords = jnp.asarray(fine.coords)
    n_dofs = fine.num_vertices * hier.dim

    # level-0-only wiring (a full P1VectorSpace.build walks every level's
    # sparsity pattern: minutes of 1-core host time at refs=4)
    lvl0 = hier.levels[0]
    pat0 = sparsity.build_pattern(lvl0.elems, lvl0.num_vertices, hier.dim)
    fixed0 = np.repeat(
        lvl0.vertex_mask(("inlet", "wall", "outlet"))[None], hier.dim, axis=0
    )

    def base_dense_fn(coords0):
        em0 = deformation_elem_mats(
            coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
        )
        v0 = sparsity.assemble_values(pat0, em0)
        v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
        return jnp.linalg.inv(sparsity.to_dense(pat0, v0))

    # V(2,2)/cheb_lower=0.2 with the bf16 smoother stream: measured best
    # at refs=4 (219 ms vs 264 for V(3,3)@0.25 - more CG iterations, each
    # ~30% cheaper; sweep record in docs/ROADMAP.md 5c)
    struct = patch_mg.PatchMGStructure(
        ps, pre_smooth=2, post_smooth=2, cheb_lower=0.2
    )
    # device tables passed as jit ARGUMENTS (not baked constants) so the
    # persistent compile cache stays effective
    tabs = patch_mg.make_level_tables(ps, coords.dtype)
    t0 = time.perf_counter()
    assemble = jax.jit(
        lambda c, tabs: patch_mg.assemble_patch_mg(
            ps, struct, c,
            deformation_corner_block_fn(1.0, 1.0, 1.0),
            base_dense_fn,
            tabs=tabs,
            sym=True,
        )
    )
    data = assemble(coords, tabs)
    float(data.lmax[-1])  # fetch forces completion through the axon tunnel
    dt_asm = time.perf_counter() - t0
    # first fetch may also absorb the tunnel warmup; label the compile-cache
    # outcome so round-over-round artifacts show whether the persistent
    # cache hit (VERDICT r1: the 494 s refs=3 assembly was a cold cache)
    log(
        f"refs={num_refs}: assembly (incl compile): {dt_asm:.2f}s; dofs={n_dofs}"
        f" [compile cache {'HIT' if dt_asm < 60.0 else 'MISS-or-cold'}]"
    )
    return dict(hier=hier, ps=ps, struct=struct, data=data, coords=coords)


def run_size(num_refs):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from admm_optim_tpu.ops import patchstencil as st
    from admm_optim_tpu.solvers import patch_mg

    ctx = assemble_ctx(num_refs)
    hier, ps, struct, data, coords = (
        ctx["hier"], ctx["ps"], ctx["struct"], ctx["data"], ctx["coords"]
    )
    fine = hier.fine
    n_dofs = fine.num_vertices * hier.dim
    rel_tol = 1e-8
    log(patch_mg.vcycle_cost_table(struct, data))

    rng = np.random.default_rng(0)
    b_g = jnp.asarray(rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype)
    free_g = ~fine.vertex_mask(("inlet", "wall", "outlet"))
    b_g = b_g * jnp.asarray(free_g, coords.dtype)[None]
    b_p = st.to_patch(ps.fine, b_g)

    # ONE compiled solve graph (remote compiles through the tunnel are the
    # budget eater): REPS chained IR solves + the last solve's stats
    @jax.jit
    def chain_solves(data, b):
        def body(i, carry):
            b, acc, _, _, _ = carry
            res = patch_mg.cg_ir_p(
                struct, data, b, rel_tol=rel_tol, max_rounds=8,
                inner_rel=1e-5, inner_iters=80,
            )
            x = res.x_hi + res.x_lo
            scale = 1.0 / (1.0 + jnp.sqrt(st.owner_dot(ps.fine, x, x)))
            return (x * scale, acc + res.inner_iters, res.res_norm,
                    res.converged, res.rounds)

        init = (b, jnp.array(0, jnp.int32), jnp.array(0.0, b.dtype),
                jnp.array(False), jnp.array(0, jnp.int32))
        b, acc, nrm, conv, rounds = jax.lax.fori_loop(0, REPS, body, init)
        return jnp.sum(b), acc, nrm, conv, rounds

    t0 = time.perf_counter()
    s, acc, nrm, conv, rounds = chain_solves(data, b_p)
    float(s)  # compile + settle
    dt_warm = time.perf_counter() - t0
    log(
        f"refs={num_refs}: warmup chain: iters/solve={int(acc) // REPS} "
        f"last rounds={int(rounds)} res={float(nrm):.3e} converged={bool(conv)} "
        f"({dt_warm:.2f}s incl compile)"
        f" [compile cache {'HIT' if dt_warm < 30.0 else 'MISS-or-cold'}]"
    )
    if not bool(conv):
        raise RuntimeError(f"refs={num_refs}: IR solve did not converge to {rel_tol}")
    t0 = time.perf_counter()
    s, acc, nrm, conv, rounds = chain_solves(data, b_p)
    float(s)
    dt = (time.perf_counter() - t0) / REPS
    dof_per_s = n_dofs / dt
    log(
        f"refs={num_refs}: {dt * 1e3:.1f} ms/solve, {int(acc) // REPS} iters/solve, "
        f"{dof_per_s:.3e} DoF/s"
    )
    # self-evidencing per-size record (VERDICT r2 item 7): one greppable
    # JSON line per size attempted, so the artifact tail proves every claim
    log("SIZE-RECORD " + json.dumps({
        "refs": num_refs, "dofs": n_dofs, "ms_per_solve": dt * 1e3,
        "dof_per_s": dof_per_s, "iters_per_solve": int(acc) // REPS,
        "rel_residual": float(nrm), "converged": bool(conv),
    }))
    ctx = dict(hier=hier, ps=ps, struct=struct, data=data, coords=coords)
    return dof_per_s, ctx


def admm_throughput(num_refs, ctx):
    """Secondary metric (BASELINE.md "ADMM iters/sec"): wall-clock per full
    ADMM inner iteration (z-prox + 2-Newton constrained x-update + dual
    ascent) on the patch backend.  Logged as a JSON record on stderr so the
    stdout contract (exactly one JSON line) holds."""
    import jax
    import jax.numpy as jnp

    from admm_optim_tpu.ops import patchstencil as st
    from admm_optim_tpu.optim import admm
    from admm_optim_tpu.optim.spaces import PatchOps

    hier, ps, struct, data = ctx["hier"], ctx["ps"], ctx["struct"], ctx["data"]
    coords = ctx["coords"]
    fine = hier.fine
    elems = jnp.asarray(fine.elems)
    K = 5
    cfg = admm.ADMMConfig(
        admm_steps=K, admm_tolerance=0.0,  # run all K iterations
        tau=1.0, ns_max_its=2, ns_tol=1e-4,
        lin_max_iters=40, lin_abs_tol=1e-7, lin_rel_tol=1e-5,
        # measured refs=4 (docs/ROADMAP.md round-3): CG on the symmetric
        # KKT Hessian runs 3.10 s/iter vs BiCGStab's 4.03 (89 vs 57 its at
        # half the applies/iter), and the VMAPPED solves with the batched
        # pencil smoother (W streamed once across the 1+m lanes) beat the
        # sequential form; the r2 OOM that forced sequencing was the AD
        # constraint temporaries, gone since the analytic cofactor forms
        x_solver="cg",
        xsolve_sequential=False,
    )
    coords_p = st.to_patch(ps.fine, jnp.asarray(coords).T)
    ops_ = PatchOps(struct, data, coords_p)
    import numpy as np

    rng = np.random.default_rng(1)
    Jp_g = jnp.asarray(
        rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype
    ) * jnp.asarray(~fine.vertex_mask(("inlet", "wall", "outlet")), coords.dtype)
    Jp_p = st.to_patch(ps.fine, Jp_g) * 0.01
    # reference constraint targets in numpy: an unjitted op-by-op einsum at
    # E=5.5M materializes (d, d, E) with a (4,128)-tiled layout on the two
    # size-d axes = 10.5 GB of padding (measured OOM at refs=4)
    Xn = np.asarray(coords, np.float64)
    En = np.asarray(fine.elems)
    T = Xn[En[:, 1:]] - Xn[En[:, :1]]  # (E, d, d) edge matrices
    import math

    voln = np.abs(np.linalg.det(T)) / math.factorial(hier.dim)
    ref_vol = jnp.asarray(voln.sum(), coords.dtype)
    cent = Xn[En].mean(axis=1)  # (E, d)
    ref_bary = jnp.asarray((voln[:, None] * cent).sum(0), coords.dtype)

    @jax.jit
    def run(data, coords_p, Jp_p):
        stt = admm.admm_inner_ops(
            cfg, PatchOps(struct, data, coords_p), Jp_p,
            jnp.asarray(0.3, coords.dtype), jnp.asarray(1.0, coords.dtype),
            ref_vol, ref_bary,
        )
        return stt.admm_it, stt.total_newton, stt.total_lin_iters, jnp.sum(stt.u)

    t0 = time.perf_counter()
    it, nwt, lin, s = run(data, coords_p, Jp_p)
    float(s)
    log(f"admm warmup (incl compile): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    it, nwt, lin, s = run(data, coords_p, Jp_p)
    float(s)
    dt = time.perf_counter() - t0
    iters = max(int(it), 1)
    rec = {
        "metric": f"admm_iters_per_sec_refs{num_refs}_tpu",
        "value": iters / dt,
        "unit": "iter/s",
        "dofs": fine.num_vertices * hier.dim,
        "newton_per_admm": int(nwt) / iters,
        "krylov_per_admm": int(lin) / iters,
        "xsolve_sequential": cfg.xsolve_sequential,
    }
    log("ADMM-THROUGHPUT " + json.dumps(rec))
    return rec


def main():
    import os
    import threading

    import jax

    global _warmup_done
    _warmup_done = threading.Event()

    # persistent compilation cache: the driver re-runs this every round;
    # the 4-level assembly+solve graphs cost minutes of (remote) compile cold
    os.makedirs(os.path.expanduser("~/.cache/jax_admm"), exist_ok=True)
    cache_dir = os.path.expanduser("~/.cache/jax_admm")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"compile cache: {len(os.listdir(cache_dir))} entries at start")

    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()}")
    if platform != "cpu":
        start_warmup_thread()
        start_watchdog()
    else:
        # CPU fallback runs in f64 (the DF iterative refinement stalls just
        # above 1e-8 on tiny problems in pure f32; the TPU path is f32+DF)
        jax.config.update("jax_enable_x64", True)
        _warmup_t[0] = time.perf_counter()
        _warmup_done.set()

    # fixed proxy baseline: the MG x-update solve measured on this repo's
    # first working TPU build (r1, 2026-08-16, block-ELL backend): 9.5e5
    # DoF/s at 3D refs=3.
    baseline = 9.5e5
    start = time.perf_counter()

    def elapsed():
        # measured-work clock: starts when the warmup fetch lands (host-side
        # mesh/compile work before that overlaps the tunnel wait)
        t0 = _warmup_t[0] if _warmup_t[0] is not None else start
        return time.perf_counter() - t0

    # Phase order under the COLD-COMPILE reality (measured r4: the
    # persistent compile cache does NOT survive across processes through
    # the axon remote-compile tunnel - in-process re-jits of the same HLO
    # hit, fresh processes always miss, so every driver round pays full
    # compiles).  Measured cold phase costs on v5e: refs=4 solve ~270 s,
    # ADMM@refs=4 ~240 s, refs=3 ~150 s, refs=5 ~440 s.  The two headline
    # records (refs=4 solve + the ADMM-throughput target) come first and
    # fit the 540 s budget together; refs=3 rides the watchdog slack;
    # refs=5 (22.4M DoF, measured this round at 1.42e7 DoF/s with a
    # raised local budget - docs/ROADMAP.md r4) only runs when the budget
    # is demonstrably warm or raised via BENCH_BUDGET_S.
    def run_one_size(refs):
        try:
            dof_per_s, ctx = run_size(refs)
            return dof_per_s, ctx
        except Exception as e:  # noqa: BLE001 - emit whatever we have
            log(f"refs={refs} failed: {e!r}")
            log("SIZE-RECORD " + json.dumps(
                {"refs": refs, "failed": repr(e)[:200]}))
            return None, None

    if platform == "cpu":
        dof_per_s, ctx = run_one_size(1)
        if dof_per_s is None:
            print(json.dumps({"metric": "bench_failed", "value": 0.0,
                              "unit": "dof/s", "vs_baseline": 0.0}))
            return
        _emit(f"mg_xupdate_1em8_dof_per_s_refs1_{platform}", dof_per_s,
              dof_per_s / baseline)
        return

    best = None

    def record_best(refs, dof_per_s):
        nonlocal best
        if dof_per_s is not None and (best is None or dof_per_s > best[1]):
            best = (refs, dof_per_s)
            _best_result.update(
                metric=f"mg_xupdate_1em8_dof_per_s_refs{refs}_{platform}",
                value=dof_per_s,
                vs_baseline=dof_per_s / baseline,
            )

    dof_per_s, ctx4 = run_one_size(4)
    record_best(4, dof_per_s)
    # ADMM throughput on the STILL-RESIDENT refs=4 stencils (re-assembly
    # in a cold process would cost another ~160 s compile)
    if ctx4 is not None and elapsed() < BUDGET_S * 1.05:
        try:
            admm_throughput(4, ctx4)
        except Exception as e:  # noqa: BLE001 - secondary must not sink main
            log(f"admm throughput refs=4 failed: {e!r}")
    else:
        log(f"skipping admm throughput: out of budget ({elapsed():.0f}s used)")
    del ctx4  # refs=4 residue OOMs larger assemblies (measured r2)

    for refs, gate in ((5, 0.45), (3, 1.1)):
        if elapsed() > BUDGET_S * gate:
            log(f"skipping refs={refs}: out of budget ({elapsed():.0f}s used)")
            log("SIZE-RECORD " + json.dumps({"refs": refs, "skipped": "budget"}))
            continue
        dof_per_s, ctx = run_one_size(refs)
        del ctx
        record_best(refs, dof_per_s)

    if best is None:
        print(json.dumps({"metric": "bench_failed", "value": 0.0, "unit": "dof/s",
                          "vs_baseline": 0.0}))
        return
    refs, dof_per_s = best
    _emit(
        f"mg_xupdate_1em8_dof_per_s_refs{refs}_{platform}",
        dof_per_s,
        dof_per_s / baseline,
    )


if __name__ == "__main__":
    main()
