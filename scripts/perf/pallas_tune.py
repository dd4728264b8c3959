import sys, time, os
import jax, jax.numpy as jnp, numpy as np
def log(*a): print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import pickle
from admm_optim_tpu.ops import pallas_stencil as pst
REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
with open(os.path.expanduser(f"~/.cache/jax_admm/host_mesh_3d_refs{REFS}_v3.pkl"), "rb") as f:
    hier, ps = pickle.load(f)
lvl = ps.fine
lat = tuple(lvl.m + 1 for _ in range(ps.dim))
P = lvl.gid.shape[0]; O = len(ps.stencil); C = ps.dim
rng = np.random.default_rng(0)
W = jnp.asarray(rng.normal(size=(O, C, C) + lat + (P,)).astype(np.float32))
x = jnp.asarray(rng.normal(size=(C,) + lat + (P,)).astype(np.float32))
def chain(fn, n, *args):
    @jax.jit
    def run(x, *args):
        def body(i, x):
            y = fn(x, *args)
            return y / (1.0 + jnp.sqrt(jnp.sum(y * y)))
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))
    t0 = time.perf_counter(); float(run(x, *args)); t1 = time.perf_counter()
    t0b = time.perf_counter(); float(run(x, *args)); t2 = time.perf_counter()
    return (t2 - t0b) / n, t1 - t0
for sc in [int(v) for v in sys.argv[2:]] or [5, 8, 15]:
    try:
        per, first = chain(lambda v, W: pst.apply_w_pallas(ps, W, v, slot_chunk=sc), 50, W)
        log(f"refs={REFS} slot_chunk={sc}: {per*1e3:7.3f} ms (first {first:.1f}s)")
    except Exception as e:
        log(f"refs={REFS} slot_chunk={sc}: FAILED {type(e).__name__}: {str(e)[:200]}")
