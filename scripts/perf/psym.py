import sys, time, os
import jax, jax.numpy as jnp, numpy as np
import time as _t
_T0=_t.perf_counter()
def log(*a): print(f"[{_t.perf_counter()-_T0:7.1f}s]", *a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import pickle
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops import pallas_stencil as pst
REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
with open(os.path.expanduser(f"~/.cache/jax_admm/host_mesh_3d_refs{REFS}_v3.pkl"), "rb") as f:
    hier, ps = pickle.load(f)
lvl = ps.fine
lat = tuple(lvl.m + 1 for _ in range(ps.dim))
P = lvl.gid.shape[0]; C = ps.dim
H = len(st.half_slots(ps))
rng = np.random.default_rng(0)
Wس = None
W = jnp.asarray(rng.normal(size=(H, C, C) + lat + (P,)).astype(np.float32))
x = jnp.asarray(rng.normal(size=(C,) + lat + (P,)).astype(np.float32))
# correctness vs XLA sym apply
log("arrays built")
pst.ENABLED = False
y_xla = jax.jit(lambda W, x: st.apply_w(ps, W, x))(W, x)
log("xla apply done")
pst.ENABLED = True
y_pal = jax.jit(lambda W, x: st.apply_w(ps, W, x))(W, x)
err = float(jnp.max(jnp.abs(y_xla - y_pal)) / jnp.max(jnp.abs(y_xla)))
log(f"refs={REFS} sym pallas vs xla rel err: {err:.3e}")
assert err < 1e-6, err
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
per, first = chain(lambda v, W: pst.apply_w_pallas(ps, W, v), 50, W)
log(f"refs={REFS} sym pallas: {per*1e3:7.3f} ms (first {first:.1f}s)")
pst.ENABLED = False
per2, _ = chain(lambda v, W: st.apply_w(ps, W, v), 50, W)
log(f"refs={REFS} sym xla:    {per2*1e3:7.3f} ms  speedup {per2/per:.2f}x")
