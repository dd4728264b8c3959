"""Probe: apply_w variants at one refinement level on TPU.

Variants: full-stencil f32, symmetric-half f32, full-stencil bf16-W
(f32 x / f32 accumulate).  Reports ms/apply and effective HBM GB/s vs the
physically-tiled W bytes.
"""
import sys, time, os
import jax, jax.numpy as jnp, numpy as np

def log(*a): print(*a, file=sys.stderr, flush=True)

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import pickle
from admm_optim_tpu.ops import patchstencil as st

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
with open(os.path.expanduser(f"~/.cache/jax_admm/host_mesh_3d_refs{REFS}_v3.pkl"), "rb") as f:
    hier, ps = pickle.load(f)
lvl = ps.fine
lat = tuple(lvl.m + 1 for _ in range(ps.dim))
P = lvl.gid.shape[0]
O = len(ps.stencil)
H = len(st.half_slots(ps))
C = ps.dim
rng = np.random.default_rng(0)

def mk(shape, dtype=jnp.float32):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)

x = mk((C,) + lat + (P,))

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

def phys_bytes(shape, dtype_bytes, sub=8, lane=128):
    # physically tiled size: last two dims padded to (8,128) tiles
    s = list(shape)
    s[-1] = -(-s[-1] // lane) * lane
    s[-2] = -(-s[-2] // sub) * sub
    return int(np.prod(s)) * dtype_bytes

N = 50
for name, Wshape, dt, sub in [
    ("full f32", (O, C, C) + lat + (P,), jnp.float32, 8),
    ("sym  f32", (H, C, C) + lat + (P,), jnp.float32, 8),
    ("full bf16", (O, C, C) + lat + (P,), jnp.bfloat16, 16),
]:
    W = mk(Wshape, dt)
    per, first = chain(lambda v, W: st.apply_w(ps, W, v), N, W)
    wb = phys_bytes(Wshape, 2 if dt == jnp.bfloat16 else 4, sub)
    log(f"refs={REFS} {name}: {per*1e3:7.3f} ms  (first {first:5.1f}s)  "
        f"W_phys={wb/2**30:.2f} GiB  eff={(wb)/per/1e9:.0f} GB/s")
    del W
