"""TPU perf: NS solve with ELL vs patch velocity-block preconditioner."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

def log(*a): print(*a, file=sys.stderr, flush=True)

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import threading
def warm():
    y = jax.jit(lambda x: x + 1.0)(jnp.ones((8,), jnp.float32)); float(y[0])
    log("[warm] done")
threading.Thread(target=warm, daemon=True).start()

from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig, f32_presets
from admm_optim_tpu.optim import admm as admmmod
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.solvers import ns_solver

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 3
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05

for backend in (sys.argv[4:] or ("global", "auto")):
    t0 = time.perf_counter()
    cfg = f32_presets(ProblemConfig(dim=DIM, num_refs=REFS, visc=VISC, backend=backend))
    prob = ObstacleShapeOpt(cfg)
    log(f"[{backend}] init {time.perf_counter()-t0:.1f}s use_patch_ns={prob.use_patch_ns} "
        f"n_vel={prob.ns_space.n_vel} n_dofs={prob.ns_space.n_vel*DIM + prob.ns_space.n_vertices}")
    X = prob.X0
    s0 = prob.initial_state(X)
    # preconditioner build time
    t0 = time.perf_counter()
    m_args = prob._ns_pre(X, s=s0)
    jax.block_until_ready(m_args)
    t_pre_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    m_args = prob._ns_pre(X, s=s0)
    jax.block_until_ready(m_args)
    log(f"[{backend}] precond build: {time.perf_counter()-t0:.3f}s (first {t_pre_compile:.1f}s)")
    # full NS solve wall time (host-stepped or monolithic per model choice)
    t0 = time.perf_counter()
    s, it, nrm, conv = prob._ns_solve(X, s0)
    jax.block_until_ready(s)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2, it2, nrm2, conv2 = prob._ns_solve(X, s0)
    jax.block_until_ready(s2)
    log(f"[{backend}] NS solve: {time.perf_counter()-t0:.2f}s warm (first {t_first:.1f}s) "
        f"iters={int(it2)} |R|={float(nrm2):.2e} conv={bool(conv2)}")
print("DONE")
