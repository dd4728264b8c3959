"""TPU perf: roll-based slab exchange (constant patch-stride neighbor fetch).

The slab exchange's lane-axis gathers (slab[..., nbr], 2 per axis sweep, plus
6 corr write-back gathers) run at ~1 output element/cycle on TPU.  Brick
grids have (near-)constant patch-index strides per axis (<= 2 distinct
deltas; the obstacle hole splits the grid), so the neighbor fetch can be a
masked lane ROLL per delta: roll(slab, -d)[..., i] = slab[..., i+d], selected
by (nbr[i] == i+d) & valid - wrap-around lanes self-mask because nbr < P.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/exch2.py [refs]
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

sys.path.insert(0, "/root/repo")
import bench as benchmod
from admm_optim_tpu.ops import patchstencil as st

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
hier, ps = benchmod.get_mesh(REFS)
lvl = ps.fine
tab = st.make_tables(lvl, jnp.float32)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(3,) + lvl.lat_shape + (lvl.P,)), jnp.float32)
dim = ps.dim
P = lvl.P

# host: per (axis, side) delta list + (ndeltas, P) selection masks
ar = np.arange(P)
deltas_all, sels_all = [], []
for a in range(dim):
    da, sa = [], []
    for sd in range(2):
        valid = lvl.face_mask[a, sd] > 0
        ds = np.unique(lvl.face_nbr[a, sd][valid] - ar[valid])
        sel = np.zeros((len(ds), P), np.float32)
        for k, d in enumerate(ds):
            sel[k] = ((lvl.face_nbr[a, sd] - ar) == d) & valid
        da.append(tuple(int(v) for v in ds))
        sa.append(jnp.asarray(sel))
    deltas_all.append(tuple(da))
    sels_all.append(tuple(sa))
log("deltas:", deltas_all)


def nbr_roll(slab_src, a, sd, dtype):
    ds = deltas_all[a][sd]
    sel = sels_all[a][sd].astype(dtype)
    out = None
    for k, d in enumerate(ds):
        t = (jnp.roll(slab_src, -d, axis=-1) if d else slab_src) * sel[k]
        out = t if out is None else out + t
    return jnp.zeros_like(slab_src) if out is None else out


def exchange_roll(tab, x, corr=True):
    C = x.shape[0]
    lat = x.shape[1 : 1 + dim]
    x_in = x
    for a in range(dim):
        lo = [slice(None)] * (dim + 2)
        hi = [slice(None)] * (dim + 2)
        lo[1 + a], hi[1 + a] = 0, lat[a] - 1
        lo, hi = tuple(lo), tuple(hi)
        slab_lo, slab_hi = x[lo], x[hi]
        new_lo = slab_lo + nbr_roll(slab_hi, a, 0, x.dtype)
        new_hi = slab_hi + nbr_roll(slab_lo, a, 1, x.dtype)
        x = x.at[lo].set(new_lo).at[hi].set(new_hi)
    if corr and tab.corr_nseg:
        vals = x_in[(slice(None),) + tab.corr_idx]
        sums = vals @ tab.corr_group_oh.astype(x.dtype)
        sums0 = jnp.concatenate([jnp.zeros((C, 1), x.dtype), sums], axis=1)
        for f in range(2 * dim):
            a, sd = f // 2, f % 2
            sl = [slice(None)] * (dim + 2)
            sl[1 + a] = 0 if sd == 0 else lat[a] - 1
            sl = tuple(sl)
            sm = tab.corr_slot[f]
            dense = sums0[:, sm]
            x = x.at[sl].set(jnp.where((sm > 0)[None], dense, x[sl]))
    return x


ref = st.exchange_sum(None, x, tab)
got = exchange_roll(tab, x)
err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
log(f"roll vs ref rel err: {err:.2e}")
assert err < 1e-6, err


def chain(fn, n):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x)
            return y / (1.0 + jnp.sqrt(jnp.sum(y * y)))

        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    t0 = time.perf_counter()
    float(run(x))
    t1 = time.perf_counter()
    t0b = time.perf_counter()
    float(run(x))
    t2 = time.perf_counter()
    return (t2 - t0b) / n, t1 - t0


n = 300
per, compile_s = chain(lambda v: st.exchange_sum(None, v, tab), n)
log(f"exchange current:        {per*1e3:.3f} ms (compile {compile_s:.1f}s)")
per, compile_s = chain(lambda v: exchange_roll(tab, v), n)
log(f"exchange roll:           {per*1e3:.3f} ms (compile {compile_s:.1f}s)")
per, compile_s = chain(lambda v: exchange_roll(tab, v, corr=False), n)
log(f"exchange roll, no corr:  {per*1e3:.3f} ms (compile {compile_s:.1f}s)")
per, compile_s = chain(lambda v: v + 1.0, n)
log(f"elementwise floor:       {per*1e3:.3f} ms")
