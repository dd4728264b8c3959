"""TPU perf: batched design sweep (BASELINE.md north star: vmap 64
geometries / rho-schedules on one chip).

Measures sigma_sweep(B) wall time vs B sequential admm_inner calls at the
same configuration: the batched program should approach the arithmetic
throughput limit (B solves for ~the cost of the widest kernel launch
sequence) because every kernel in the ADMM loop vmaps to a batched einsum/
stencil with the batch on the leading (sublane-tiled) axis.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/sweepbench.py [dim] [refs] [B]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

def log(*a):
    print(*a, file=sys.stderr, flush=True)

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import threading

def warm():
    y = jax.jit(lambda x: x + 1.0)(jnp.ones((8,), jnp.float32))
    float(y[0])
    log("[warm] tunnel up")

threading.Thread(target=warm, daemon=True).start()

from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig, f32_presets
from admm_optim_tpu.models import sweep
from admm_optim_tpu.optim import admm as admmmod

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
B = int(sys.argv[3]) if len(sys.argv) > 3 else 64

cfg = f32_presets(
    ProblemConfig(
        dim=DIM, num_refs=REFS, visc=0.05,
        admm=admmmod.ADMMConfig(admm_steps=60, ns_max_its=6, tau=2.0,
                                lin_max_iters=120),
    )
)
prob = ObstacleShapeOpt(cfg)
X = prob.X0
s = prob.initial_state(X)
s, it, nrm, conv = prob._ns_solve(X, s)
log(f"NS: iters={int(it)} |R|={float(nrm):.2e} conv={bool(conv)}")
lam, *_ = prob._adjoint(X, s)
prob._cur_s = s
prob._cur_lam_adj = lam
Jp = prob._jprime(X, s, lam)

rng = np.random.default_rng(0)
sigmas = jnp.asarray(0.2 + 0.4 * rng.random(B), X.dtype)

# batched
t0 = time.perf_counter()
st = sweep.sigma_sweep(prob, X, Jp, sigmas)
jax.block_until_ready(st.u)
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
st = sweep.sigma_sweep(prob, X, Jp, sigmas)
jax.block_until_ready(st.u)
t_batch = time.perf_counter() - t0
ok = int(jnp.sum(st.converged))
log(f"batched B={B}: {t_batch:.2f}s warm (first {t_compile:.1f}s), "
    f"{ok}/{B} converged, {t_batch / B * 1e3:.1f} ms/candidate")

# sequential baseline (first few candidates, extrapolated)
NSEQ = min(8, B)
st1 = sweep.sigma_sweep(prob, X, Jp, sigmas[:1])  # compile B=1 program
jax.block_until_ready(st1.u)
t0 = time.perf_counter()
for i in range(NSEQ):
    sti = sweep.sigma_sweep(prob, X, Jp, sigmas[i : i + 1])
    jax.block_until_ready(sti.u)
t_seq = (time.perf_counter() - t0) / NSEQ
log(f"sequential: {t_seq * 1e3:.1f} ms/candidate (x{NSEQ} measured)")
log(f"SPEEDUP batched vs sequential: {t_seq * B / t_batch:.1f}x")
print("DONE")
