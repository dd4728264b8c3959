import sys, time, os
import jax, jax.numpy as jnp, numpy as np
def log(*a): print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import threading
def warm():
    y = jax.jit(lambda x: x + 1.0)(jnp.ones((8,), jnp.float32)); float(y[0])
    log("[warm] done")
threading.Thread(target=warm, daemon=True).start()
import pickle
from admm_optim_tpu.ops import patchstencil as st

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
with open(os.path.expanduser(f"~/.cache/jax_admm/host_mesh_3d_refs{REFS}_v2.pkl"), "rb") as f:
    hier, ps = pickle.load(f)
lvl = ps.fine
tab = st.make_tables(lvl, jnp.float32)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(3,) + lvl.lat_shape + (lvl.P,)), jnp.float32)

def exchange_corr_scatter(tab, x):
    dim = x.ndim - 2
    lat = x.shape[1:1+dim]
    nbr = tab.face_nbr
    mask = tab.face_mask.astype(x.dtype)
    x_in = x
    for a in range(dim):
        lo = [slice(None)] * (dim + 2)
        hi = [slice(None)] * (dim + 2)
        lo[1 + a], hi[1 + a] = 0, lat[a] - 1
        lo, hi = tuple(lo), tuple(hi)
        slab_lo, slab_hi = x[lo], x[hi]
        new_lo = slab_lo + slab_hi[..., nbr[a, 0]] * mask[a, 0]
        new_hi = slab_hi + slab_lo[..., nbr[a, 1]] * mask[a, 1]
        x = x.at[lo].set(new_lo).at[hi].set(new_hi)
    if tab.corr_nseg:
        oh = tab.corr_group_oh.astype(x.dtype)
        vals = x_in[(slice(None),) + tab.corr_idx]        # (C, Bc)
        sums = vals @ oh                                   # (C, G)
        out = sums @ oh.T                                  # (C, Bc)
        x = x.at[(slice(None),) + tab.corr_idx].set(out)
    return x

ref = st.exchange_sum(None, x, tab)
got = exchange_corr_scatter(tab, x)
err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
log(f"scatter-corr vs ref rel err: {err:.2e}")

import dataclasses
tab_nocorr = dataclasses.replace(tab) if False else None

def chain(fn, n):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x)
            return y / (1.0 + jnp.sqrt(jnp.sum(y * y)))
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))
    t0 = time.perf_counter(); float(run(x)); t1 = time.perf_counter()
    t0b = time.perf_counter(); float(run(x)); t2 = time.perf_counter()
    return (t2 - t0b) / n, t1 - t0

per, _ = chain(lambda v: st.exchange_sum(None, v, tab), 300)
log(f"exchange current: {per*1e3:.3f} ms")
per, _ = chain(lambda v: exchange_corr_scatter(tab, v), 300)
log(f"exchange scatter-corr: {per*1e3:.3f} ms")

# lower bound: faces only
def exchange_faces_only(tab, x):
    dim = x.ndim - 2
    lat = x.shape[1:1+dim]
    nbr = tab.face_nbr
    mask = tab.face_mask.astype(x.dtype)
    for a in range(dim):
        lo = [slice(None)] * (dim + 2)
        hi = [slice(None)] * (dim + 2)
        lo[1 + a], hi[1 + a] = 0, lat[a] - 1
        lo, hi = tuple(lo), tuple(hi)
        slab_lo, slab_hi = x[lo], x[hi]
        new_lo = slab_lo + slab_hi[..., nbr[a, 0]] * mask[a, 0]
        new_hi = slab_hi + slab_lo[..., nbr[a, 1]] * mask[a, 1]
        x = x.at[lo].set(new_lo).at[hi].set(new_hi)
    return x
per, _ = chain(lambda v: exchange_faces_only(tab, v), 300)
log(f"exchange faces-only: {per*1e3:.3f} ms")
