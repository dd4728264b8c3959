"""TPU diagnostic: is the sym kernel's cost in the shifted pair-block
fetches?  Times at refs=4 fine level:
  1. sym-storage Pallas apply (current production path)
  2. full-stencil Pallas apply on expand_sym_w(W) (2x W bytes, but all
     fetches are one contiguous dir block per chunk - no clamped shift DMAs)
  3. XLA sym apply (reference point)
Usage: python scripts/perf/symdiag.py [refs]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import bench as benchmod
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops import pallas_stencil as pst
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.deformation import (
    deformation_corner_block_fn,
    deformation_elem_mats,
)
from admm_optim_tpu.solvers import patch_mg

REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

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
float(data.lmax[-1])
W_sym = data.W[ps.k]
W_full = jax.jit(lambda w: st.expand_sym_w(ps, w))(W_sym)
float(W_full[0, 0, 0, 0, 0, 0, 0])
log(f"W_sym {W_sym.shape} W_full {W_full.shape}")

rng = np.random.default_rng(0)
b_g = jnp.asarray(rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype)
b_p = st.to_patch(ps.fine, b_g)

stencil = tuple(tuple(int(v) for v in o) for o in ps.stencil)
kept = tuple(st.half_slots(ps))


def timeit(name, fn, n, x0, W):
    @jax.jit
    def chain(x, W):
        def body(i, x):
            y = fn(x, W)
            return y / (1.0 + jnp.float32(1e-30) * i)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    s = chain(x0, W)
    float(s)
    t0 = time.perf_counter()
    s = chain(x0, W)
    float(s)
    dt = (time.perf_counter() - t0) / n
    log(f"{name:>34}: {dt * 1e3:8.3f} ms")
    return dt


timeit(
    "pallas sym (production)",
    lambda x, W: pst._apply_w_pallas_3d_sym(stencil, kept, 4, W, x),
    50, b_p, W_sym,
)
for nsl in (5, 15):
    timeit(
        f"pallas full expand nsl={nsl}",
        lambda x, W, nsl=nsl: pst._apply_w_pallas_3d(stencil, nsl, W, x),
        50, b_p, W_full,
    )
for nsl in (2, 8):
    timeit(
        f"pallas sym nsl={nsl}",
        lambda x, W, nsl=nsl: pst._apply_w_pallas_3d_sym(stencil, kept, nsl, W, x),
        50, b_p, W_sym,
    )
pst.ENABLED = False
try:
    timeit("xla sym", lambda x, W: st.apply_w(ps, W, x), 20, b_p, W_sym)
finally:
    pst.ENABLED = True
print("DONE")
