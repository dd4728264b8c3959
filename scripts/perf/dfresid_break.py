"""TPU perf: break down residual_df (apply_w_df vs exchange_sum_df vs df.add).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/dfresid_break.py [refs]
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
from admm_optim_tpu.ops import df
from admm_optim_tpu.ops import patchstencil as st
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
tab = data.tabs[ps.k]
W = data.W[ps.k]
log(f"refs={REFS}, dofs={fine.num_vertices * hier.dim}, dfg buckets "
    f"{tab.dfg_bsizes}")

rng = np.random.default_rng(0)
xh = st.to_patch(ps.fine, jnp.asarray(
    rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype))
xl = jnp.asarray(rng.normal(size=xh.shape), coords.dtype) * 1e-8
b = xh


def timeit(name, fn, n, *args):
    @jax.jit
    def chain(*a):
        def body(i, x):
            pair = fn(x, *a[1:])
            return pair[0] / (1.0 + 1e-30 * i)

        return jnp.sum(jax.lax.fori_loop(0, n, body, a[0]))

    s = chain(*args)
    float(s)
    t0 = time.perf_counter()
    float(chain(*args))
    dt = (time.perf_counter() - t0) / n
    log(f"{name:>26}: {dt * 1e3:8.3f} ms")
    return dt


timeit("apply_w_df", lambda x, W, xl: st.apply_w_df(ps, W, x, xl), 10, xh, W, xl)
timeit("exchange_sum_df", lambda x, xl: st.exchange_sum_df(tab, x, xl), 10, xh, xl)
timeit(
    "plain exchange_sum",
    lambda x: (st.exchange_sum(ps.fine, x, tab=tab), x),
    20, xh,
)
timeit(
    "df.add (sub step)",
    lambda x, xl: (lambda r: (r.hi, r.lo))(
        df.add(df.from_f(b), df.DF(-x, -xl))
    ),
    20, xh, xl,
)
timeit(
    "residual_df (full)",
    lambda x, xl, data, b: patch_mg.residual_df(struct, data, b, x, xl),
    10, xh, xl, data, b,
)
print("DONE")
