"""Microbench: ELL SpMV variants on TPU - ordering + gather layout.

Variants:
  base   : current spmv_cn ((C,N) field, x_cn[:, cols] gather)
  morton : same kernel, vertices renumbered by Morton order of coords
  inter  : interleaved (N,C) field, single row gather x_nc[cols] -> (K,N,C)
  mo+in  : both
Prints ms per SpMV for each.
"""
import os, sys, time, pickle
import jax, jax.numpy as jnp, numpy as np

def log(*a): print(*a, file=sys.stderr, flush=True)

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import threading
def warm():
    y = jax.jit(lambda x: x + 1.0)(jnp.ones((8,), jnp.float32)); float(y[0])
    log("[warm] done")
threading.Thread(target=warm, daemon=True).start()

from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.deformation import deformation_elem_mats

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
with open(os.path.expanduser(f"~/.cache/jax_admm/host_mesh_3d_refs{REFS}_v2.pkl"), "rb") as f:
    hier, _ps = pickle.load(f)
fine = hier.fine
d = hier.dim
V = fine.num_vertices
log(f"refs={REFS}: V={V} E={fine.num_elems} dofs={V*d}")

def morton_order(coords):
    c = np.asarray(coords, np.float64)
    lo, hi = c.min(0), c.max(0)
    q = np.clip(((c - lo) / np.maximum(hi - lo, 1e-30) * 1023).astype(np.uint64), 0, 1023)
    key = np.zeros(len(c), np.uint64)
    for b in range(10):
        for a in range(c.shape[1]):
            key |= ((q[:, a] >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * c.shape[1] + a)
    return np.argsort(key, kind="stable")

def build(elems, V, perm=None):
    if perm is not None:
        inv = np.empty(V, np.int64); inv[perm] = np.arange(V)
        elems = inv[elems]
    t0 = time.perf_counter()
    pat = sparsity.build_pattern(elems, V, d)
    log(f"  pattern built in {time.perf_counter()-t0:.1f}s K={pat.K}")
    coords = np.asarray(fine.coords)
    if perm is not None:
        coords = coords[perm]
    em = deformation_elem_mats(jnp.asarray(coords, jnp.float32), jnp.asarray(elems), 1.0, 1.0, 1.0)
    vals = sparsity.assemble_values(pat, em)
    return pat, vals

def bench(fn, x, n=30, label=""):
    @jax.jit
    def chain(x):
        def body(i, x):
            y = fn(x)
            return y / (1.0 + jnp.max(jnp.abs(y)))
        return jax.lax.fori_loop(0, n, body, x)
    y = chain(x); jnp.sum(y).block_until_ready(); float(jnp.sum(y))
    t0 = time.perf_counter()
    y = chain(x); float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / n * 1e3
    log(f"{label}: {dt:.3f} ms/spmv")
    return dt

rng = np.random.default_rng(0)
x_cn = jnp.asarray(rng.normal(size=(d, V)), jnp.float32)

results = {}
perm = morton_order(fine.coords)
for name, p in [("base", None), ("morton", perm)]:
    pat, vals = build(np.asarray(fine.elems), V, p)
    cols = jnp.asarray(pat.cols)
    # current layout
    results[name] = bench(lambda x: sparsity.spmv_cn(pat, vals, x), x_cn, label=name)
    # interleaved: x (N, C); vals -> (K, N, C, C) for row-major contraction
    vals_i = jnp.moveaxis(vals, (0, 1), (2, 3))  # (K, N, C, C)
    x_nc = x_cn.T.copy()
    def spmv_inter(x, cols=cols, vals_i=vals_i):
        xg = x[cols]                      # (K, N, C) rows are contiguous C-vectors
        return jnp.einsum("kncd,knd->nc", vals_i, xg)
    results[name + "+inter"] = bench(spmv_inter, x_nc, label=name + "+inter")

log("summary:", {k: round(v, 3) for k, v in results.items()})
print("DONE")
