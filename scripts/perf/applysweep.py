"""TPU perf: sweep the Pallas sym apply kernel's slot-chunk size.

The refs=4 kernel runs a (17, 17, nos) grid; with nsl=4 that is 578 grid
steps of ~3.3 us each, which smells per-step-overhead bound.  Times the
XLA apply_w and the Pallas sym kernel at nsl in {2, 4, 8} (nos = 2, 2, 1).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/applysweep.py [refs]
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
from admm_optim_tpu.ops import pallas_stencil as pls
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops.deformation import deformation_corner_block_fn

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
hier, ps = benchmod.get_mesh(REFS)
coords = jnp.asarray(hier.fine.coords)
coords_p = st.to_patch(ps.fine, jnp.asarray(coords.T, jnp.float32))
fn = deformation_corner_block_fn(1.0, 1.0, 1.0)
W = st.assemble_w(ps, ps.k, coords_p, fn, sym=True)
W = jax.block_until_ready(W)
log(f"refs={REFS}; sym W {W.shape} {W.dtype}")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(3,) + ps.fine.lat_shape + (W.shape[-1],)), jnp.float32)

stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
kept = tuple(st.half_slots(ps))


def timeit(name, f, *args, reps=30):
    y = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / reps * 1e3
    log(f"{name:>30s}: {dt:8.3f} ms")
    return y


y_ref = timeit("XLA apply_w (sym)", jax.jit(lambda W, x: st.apply_w(ps, W, x)), W, x)
for nsl in (2, 4, 8):
    y = timeit(
        f"pallas sym nsl={nsl}",
        lambda W, x, nsl=nsl: pls._apply_w_pallas_3d_sym(stencil, kept, nsl, W, x),
        W,
        x,
    )
    err = float(jnp.abs(y - y_ref).max() / jnp.abs(y_ref).max())
    log(f"{'rel err':>30s}: {err:.3e}")
log("DONE")
