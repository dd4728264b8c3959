"""TPU NS-stack tuning at 3D refs=2 (VERDICT r2 item 2): forward +
adjoint wall-clock for pressure_precond in {mass, pcd} x vel_inner in
{1,2,3}, plus a component-apply breakdown of the PCD pressure block
(Ap V-cycle / Fp apply / Mp / B^T coupling / velocity block).

Methodology: one shared viscosity ladder 0.16 -> ... -> 2*visc produces a
warm state s_warm; every configuration then measures the SAME work item -
solve at visc from s_warm - which is the per-step warm-solve pattern of
the outer loop (each accepted step re-solves from the previous geometry's
flow).  The adjoint is measured at the converged state.

Usage: python scripts/perf/nstune.py [visc] [refs] [configs...]
  configs: pp:k tokens, e.g. mass:1 pcd:1 pcd:2 (default sweep)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

VISC = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CONFS = [
    (t.split(":")[0], int(t.split(":")[1])) for t in sys.argv[3:]
] or [("mass", 1), ("pcd", 1), ("mass", 2), ("pcd", 2), ("mass", 3)]


def log(*a):
    print(*a, flush=True)


from admm_optim_tpu.models.obstacle import (
    ObstacleShapeOpt,
    ProblemConfig,
    f32_presets,
)
from admm_optim_tpu.solvers import ns_solver


def build(pp, k):
    cfg = f32_presets(
        ProblemConfig(dim=3, num_refs=REFS, visc=VISC,
                      pressure_precond=pp, vel_inner=k)
    )
    return ObstacleShapeOpt(cfg)


# ---- shared warm state from the first config's ladder ---------------------
prob = build(*CONFS[0])
X = prob.X0
log(f"3D refs={REFS} visc={VISC}: NS dofs={prob.ns_space.n_state}")
s = prob.initial_state(X)
nus = []
nu = 0.16
while nu > 2 * VISC * 1.0001:
    nus.append(nu)
    nu *= 0.5
nus.append(2 * VISC)
for nu in nus:
    t0 = time.perf_counter()
    s, it, nrm, conv = prob._ns_solve(X, s, visc=nu)
    log(f"ladder nu={nu:.4f}: newton={int(it)} |R|={float(nrm):.2e} "
        f"conv={bool(conv)} [{time.perf_counter() - t0:.0f}s]")
    assert bool(conv), "ladder rung failed"
s_warm = s

results = []
s_conv = None
for pp, k in CONFS:
    p = build(pp, k)
    # compile pass (not timed: persistent cache absorbs most of it)
    t0 = time.perf_counter()
    s1, it1, nrm1, conv1 = p._ns_solve(X, s_warm, visc=VISC)
    t_cold = time.perf_counter() - t0
    # measured pass (same work item, warm kernels)
    t0 = time.perf_counter()
    s2, it2, nrm2, conv2 = p._ns_solve(X, s_warm, visc=VISC)
    t_fwd = time.perf_counter() - t0
    if s_conv is None and bool(conv2):
        s_conv = s2
    # adjoint at the converged state (cold lam0 = zeros; the stepped
    # chunked path at production sizes - the monolithic solve is a single
    # multi-minute execution the tunnel kills)
    def run_adj():
        p._cur_lam_adj = None
        if p._ns_stepped:
            return p._adjoint_stepped_fn(X, s2, jnp.zeros_like(s2))
        return p._adjoint_pre(X, s2, jnp.zeros_like(s2))

    t0 = time.perf_counter()
    lam, res_a, it_a = run_adj()
    jax.block_until_ready(lam)
    t_adj_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    lam, res_a, it_a = run_adj()
    jax.block_until_ready(lam)
    t_adj = time.perf_counter() - t0
    row = dict(pp=pp, k=k, fwd_s=t_fwd, fwd_newton=int(it2),
               fwd_conv=bool(conv2), fwd_R=float(nrm2),
               adj_s=t_adj, adj_iters=int(it_a), adj_res=float(res_a),
               warm1=t_cold, adj_warm1=t_adj_cold)
    results.append(row)
    log(f"[{pp}:k={k}] fwd {t_fwd:.1f}s ({int(it2)} newton, "
        f"|R|={float(nrm2):.1e} conv={bool(conv2)}) "
        f"adj {t_adj:.1f}s ({int(it_a)} iters, |r|={float(res_a):.1e})")

# ---- PCD component breakdown ---------------------------------------------
try:
    p = next(
        (pr for (pp, k), pr in zip(CONFS, [None] * len(CONFS))), None
    )
except Exception:
    p = None
p = build("pcd", 1)
if p.use_patch_ns and s_conv is not None:
    from admm_optim_tpu.ops import patchstencil as pst
    from admm_optim_tpu.solvers import patch_mg as pmg

    pre_data, pdiag = p._ns_pre(X, s=s_conv)[0:2]
    pcd = ns_solver.ns_pcd_precond_data_patch(
        p.ns_space, p._ps_k, p._pcd_struct_p, p._pcd_tabs,
        None if not hasattr(p, "_ap_base") else p._ap_base, X, VISC, s=s_conv,
    ) if False else None
    # reuse the model's own builder for exact production args
    m_args = p._ns_pre(X, s=s_conv)
    pre_data = m_args[0]
    ap_data, W_fp, mp = m_args[1], m_args[2], m_args[3]

    def timeit(name, f, x, reps=20):
        y = f(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(x)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / reps
        log(f"  {name:>22}: {dt * 1e3:7.2f} ms")
        return dt

    rp = jnp.asarray(
        np.random.default_rng(0).normal(size=(p.ns_space.n_pressure,)),
        X.dtype,
    )
    rv = jnp.asarray(
        np.random.default_rng(1).normal(
            size=(p.cfg.dim, p.ns_space.n_vel)
        ),
        X.dtype,
    )
    log("PCD component applies (jitted, 20 reps):")
    schur = ns_solver.pcd_schur_patch_M(
        p.ns_space, p._ps_k, p._pcd_struct_p, p._pcd_tabs, ap_data, W_fp, mp
    )
    timeit("schur Mp^-1 Fp Ap^-1", jax.jit(schur), rp)
    tab = p._pcd_tabs[-1]
    timeit(
        "Ap vcycle only",
        jax.jit(lambda r: pmg.vcycle_p(
            p._pcd_struct_p, ap_data,
            pst.to_patch(p._ps_k.fine, r[None]) * tab.free[None].astype(r.dtype),
        )),
        rp,
    )
    timeit(
        "Fp apply only",
        jax.jit(lambda r: pst.exchange_sum(
            p._ps_k.fine,
            pst.apply_w(p._ps_k, W_fp, pst.to_patch(p._ps_k.fine, r[None])),
            tab=tab,
        )),
        rp,
    )
    vel_M = ns_solver.patch_velocity_M(p.pre_ps, p._pre_struct_p, pre_data)
    timeit("velocity V-cycle", jax.jit(vel_M), rv)
    if p.use_ns_jac:
        W = p._ns_jac_jit(X, s_conv, VISC)
        # W as a jit ARGUMENT: closure-captured refs=2 Jacobian blocks are
        # inlined as constants and blow the remote-compile upload limit
        # (HTTP 413, observed r4)
        bt = jax.jit(lambda zp, W: p._ns_bt(zp, W))
        timeit("B^T zp (assembled)", lambda zp: bt(zp, W), rp)

log("SUMMARY " + repr(results))
log("DONE")
