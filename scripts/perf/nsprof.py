"""Profile the NS inner loop on TPU: jvp cost vs preconditioner cost vs
GMRES iteration count, patch backend."""
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
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.solvers import ns_solver

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 3
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
BACKEND = sys.argv[4] if len(sys.argv) > 4 else "auto"
PP = sys.argv[5] if len(sys.argv) > 5 else "mass"

cfg = f32_presets(ProblemConfig(dim=DIM, num_refs=REFS, visc=VISC,
                                backend=BACKEND, pressure_precond=PP))
prob = ObstacleShapeOpt(cfg)
log(f"init done use_patch_ns={prob.use_patch_ns} pp={PP}")
X = prob.X0
s0 = prob.initial_state(X)
space = prob.ns_space

m_args = prob._ns_pre(X, s=s0)
jax.block_until_ready(m_args)

def chain(fn, x, n=20):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x)
            return y / (1.0 + jnp.sqrt(jnp.vdot(y, y)))
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))
    float(run(x))
    t0 = time.perf_counter(); float(run(x))
    return (time.perf_counter() - t0) / n * 1e3

R = lambda s: nsops.ns_residual(space, X, s, cfg.visc, cfg.stab)
Jv = lambda x: jax.jvp(R, (s0,), (x,))[1]
t_res = chain(R, s0)
log(f"residual: {t_res:.1f} ms")
t_jvp = chain(Jv, s0)
log(f"jvp:      {t_jvp:.1f} ms")

# M application (model-selected backend)
from admm_optim_tpu.models import obstacle as _m
# reconstruct the model's M the way _ns_solve does
if PP == "mass":
    pre_data, pdiag = m_args
    if prob.use_patch_ns:
        vel = ns_solver.patch_velocity_M(prob.pre_ps, prob._pre_struct_p, pre_data)
        M = ns_solver.ns_gmg_M(space, prob.pre_struct, pre_data, pdiag, vel_M=vel)
    else:
        M = ns_solver.ns_gmg_M(space, prob.pre_struct, pre_data, pdiag)
    t_M = chain(M, s0)
    log(f"M(block): {t_M:.1f} ms")

# one newton step with lin-iter count
s, it, nrm, conv = prob._ns_solve(X, s0)
log(f"full solve: iters={int(it)} |R|={float(nrm):.2e} conv={bool(conv)}")
# per-step lin iters via verbose stepped path
s2, it2, nrm2, conv2 = ns_solver.newton_solve_stepped(
    space, X, s0, cfg.visc, cfg.stab, cfg.ns,
    M_fn=None if False else (lambda r, *a: M(r)), m_args=(),
    step_jit_cache={}, verbose=True,
)
print("DONE")
