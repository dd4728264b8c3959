"""Validate + time the Pallas DF stencil kernel on the real TPU.

Checks, at 3D refs=R on the deformation operator (sym half-stencil):
  1. plain apply_w reference sanity (hi-only)
  2. XLA DF apply vs f64 ground truth      (expect ~1e-12 rel)
  3. Pallas DF apply vs f64 ground truth   (expect ~1e-12 rel; if the EFT
     identities were folded by Mosaic this degrades to ~1e-7)
  4. Pallas vs XLA DF paths elementwise
  5. timing: XLA DF vs Pallas DF vs plain apply

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/dfkernel_check.py [refs]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import threading

threading.Thread(
    target=lambda: float(jax.jit(lambda x: x + 1)(jnp.ones(8))[0]), daemon=True
).start()

sys.path.insert(0, "/root/repo")
import bench as benchmod
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops import pallas_stencil as pls
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.deformation import (
    deformation_corner_block_fn,
    deformation_elem_mats,
)
from admm_optim_tpu.solvers import patch_mg

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
hier, ps = benchmod.get_mesh(REFS)
fine = hier.fine
coords = jnp.asarray(fine.coords)
lvl0 = hier.levels[0]
pat0 = sparsity.build_pattern(lvl0.elems, lvl0.num_vertices, hier.dim)
fixed0 = np.repeat(
    lvl0.vertex_mask(("inlet", "wall", "outlet"))[None], hier.dim, axis=0
)


def base_dense_fn(coords0):
    em0 = deformation_elem_mats(
        coords0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0
    )
    v0 = sparsity.assemble_values(pat0, em0)
    v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
    return jnp.linalg.inv(sparsity.to_dense(pat0, v0))


struct = patch_mg.PatchMGStructure(ps)
tabs = patch_mg.make_level_tables(ps, coords.dtype)
assemble = jax.jit(
    lambda c, tabs: patch_mg.assemble_patch_mg(
        ps, struct, c, deformation_corner_block_fn(1.0, 1.0, 1.0),
        base_dense_fn, tabs=tabs, sym=True,
    )
)
data = assemble(coords, tabs)
W = data.W[ps.k]
float(data.lmax[-1])
log(f"assembled refs={REFS}; W {W.shape} {W.dtype}")

rng = np.random.default_rng(0)
shape = (hier.dim,) + ps.fine.lat_shape + (ps.fine.lat_P,) if hasattr(
    ps.fine, "lat_P"
) else None
xh_g = jnp.asarray(rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype)
xh = st.to_patch(ps.fine, xh_g)
xl = jnp.asarray(
    rng.normal(size=xh.shape), coords.dtype
) * 1e-8 * jnp.abs(xh)  # plausible lo parts

assert pls.usable_df(ps, W, xh), "DF kernel not applicable?!"

# --- ground truth in f64 on host ------------------------------------------
Wn = np.asarray(W, np.float64)
kept = st.half_slots(ps)
stencil = [tuple(int(v) for v in o) for o in ps.stencil]
xn = np.asarray(xh, np.float64) + np.asarray(xl, np.float64)
C = xh.shape[0]
lat = xh.shape[1:-1]
pad = [(0, 0)] + [(1, 1)] * 3 + [(0, 0)]
xp = np.pad(xn, pad)
y64 = np.zeros_like(xn)
for h, si in enumerate(kept):
    o = stencil[si]
    sl = (slice(None),) + tuple(
        slice(1 + oo, 1 + oo + n) for oo, n in zip(o, lat)
    ) + (slice(None),)
    xw = xp[sl]
    y64 += np.einsum("cd...,d...->c...", Wn[h], xw)
    if h == 0:
        continue
    # transpose half, shifted by -o
    z = np.einsum("cd...,c...->d...", Wn[h], xn)
    zp = np.pad(z, pad)
    sl2 = (slice(None),) + tuple(
        slice(1 - oo, 1 - oo + n) for oo, n in zip(o, lat)
    ) + (slice(None),)
    y64 += zp[sl2]

den = np.abs(y64).max()

# --- XLA DF path ------------------------------------------------------------
pls.ENABLED = False
xla_df = jax.jit(lambda W, a, b: st.apply_w_df(ps, W, a, b))
yh0, yl0 = xla_df(W, xh, xl)
jax.block_until_ready(yh0)
pls.ENABLED = True
err_xla = np.abs(
    (np.asarray(yh0, np.float64) + np.asarray(yl0, np.float64)) - y64
).max() / den
log(f"XLA DF   vs f64: rel {err_xla:.3e}")

# --- Pallas DF path ---------------------------------------------------------
pal_df = jax.jit(lambda W, a, b: st.apply_w_df(ps, W, a, b))
yh1, yl1 = pal_df(W, xh, xl)
jax.block_until_ready(yh1)
err_pal = np.abs(
    (np.asarray(yh1, np.float64) + np.asarray(yl1, np.float64)) - y64
).max() / den
log(f"Pallas DF vs f64: rel {err_pal:.3e}")

err_plain = np.abs(np.asarray(st.apply_w(ps, W, xh), np.float64) - y64).max() / den
log(f"plain f32 vs f64: rel {err_plain:.3e}  (the bar DF must clear)")

d_hi = np.abs(np.asarray(yh1, np.float64) - np.asarray(yh0, np.float64)).max()
log(f"Pallas vs XLA hi: max abs {d_hi:.3e}")

ok = err_pal < 1e-10 and err_pal <= err_xla * 10
log("CORRECTNESS:", "PASS" if ok else "FAIL")

# --- timing -----------------------------------------------------------------
def timeit(name, fn, n, *args):
    @jax.jit
    def chain(*a):
        def body(i, x):
            yh, yl = fn(a[1], x, a[2])
            return yh / (1.0 + 1e-30 * i)

        return jnp.sum(jax.lax.fori_loop(0, n, body, a[0]))

    s = chain(*args)
    float(s)
    t0 = time.perf_counter()
    float(chain(*args))
    dt = (time.perf_counter() - t0) / n
    log(f"{name:>22}: {dt * 1e3:8.3f} ms")
    return dt


pls.ENABLED = False
t_x = timeit("XLA DF apply", lambda W, a, b: st.apply_w_df(ps, W, a, b), 10, xh, W, xl)
pls.ENABLED = True
t_p = timeit("Pallas DF apply", lambda W, a, b: st.apply_w_df(ps, W, a, b), 10, xh, W, xl)
t_0 = timeit("plain apply (pair)", lambda W, a, b: (st.apply_w(ps, W, a), b), 20, xh, W, xl)
log(f"speedup XLA->Pallas: {t_x / t_p:.1f}x; Pallas vs plain: {t_p / t_0:.2f}x")
print("DONE" if ok else "FAIL")
