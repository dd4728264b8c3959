"""TPU perf: where does the cg_ir_p wall time go?

Times, each chained inside ONE jit (lax.fori_loop, scalar fetched to force
completion through the axon tunnel):
  - fine-level stencil apply (exchange included)
  - one V(3,3)-cycle
  - one DF (double-float) true-residual evaluation
  - one full cg_ir_p solve (the bench.py metric)
and compares against the HBM roofline from vcycle_cost_table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf/mgbreakdown.py [refs]
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
import bench as benchmod  # reuse the pickle-cached host mesh
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
log(f"assembled refs={REFS}, dofs={fine.num_vertices * hier.dim}")

rng = np.random.default_rng(0)
b_g = jnp.asarray(rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype)
free_g = ~fine.vertex_mask(("inlet", "wall", "outlet"))
b_g = b_g * jnp.asarray(free_g, coords.dtype)[None]
b_p = st.to_patch(ps.fine, b_g)
tab = data.tabs[ps.k]


def timeit(name, fn, n, x0, data):
    """fn(x, data) chained n times inside one jit (data stays a traced
    argument — baking the stencils into the HLO as constants overflows the
    remote-compile request body)."""

    @jax.jit
    def chain(x, data):
        def body(i, x):
            y = fn(x, data)
            # keep the chain data-dependent so XLA can't collapse it
            return y / (1.0 + jnp.float32(1e-30) * i)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    s = chain(x0, data)
    float(s)  # compile
    t0 = time.perf_counter()
    s = chain(x0, data)
    float(s)
    dt = (time.perf_counter() - t0) / n
    log(f"{name:>28}: {dt * 1e3:8.3f} ms")
    return dt


# fine stencil apply (with exchange, as used in CG)
t_apply = timeit(
    "fine apply_w+exchange",
    lambda x, d: patch_mg._apply(ps, d.tabs[ps.k], d.W[ps.k], x),
    50, b_p, data,
)
# raw apply without exchange
t_raw = timeit(
    "fine apply_w only", lambda x, d: st.apply_w(ps, d.W[ps.k], x), 50, b_p, data
)
# one V-cycle
t_v = timeit(
    "V(3,3) cycle", lambda x, d: patch_mg.vcycle_p(struct, d, x), 20, b_p, data
)
# DF true residual
t_df = timeit(
    "DF residual",
    lambda x, d: patch_mg.residual_df(struct, d, b_p, x, x * 0)[0],
    20, b_p, data,
)
# fine-level chebyshev smooth (3 applies)
t_sm = timeit(
    "fine cheb smooth deg3",
    lambda x, d: patch_mg.chebyshev_smooth_p(
        ps, d.tabs[ps.k], d.W[ps.k], d.inv_diag[ps.k], d.lmax[ps.k],
        x, b_p, 3, struct.cheb_lower,
    ),
    20, b_p, data,
)

# full IR solve
@jax.jit
def ir(b, data):
    res = patch_mg.cg_ir_p(
        struct, data, b, rel_tol=1e-8, max_rounds=6, inner_rel=1e-5,
        inner_iters=60,
    )
    return res.x_hi.sum() + res.x_lo.sum(), res.inner_iters, res.rounds, res.res_norm

s, it, rounds, nrm = ir(b_p, data)
float(s)
t0 = time.perf_counter()
s, it, rounds, nrm = ir(b_p, data)
float(s)
t_ir = time.perf_counter() - t0
log(
    f"{'cg_ir_p (full solve)':>28}: {t_ir * 1e3:8.1f} ms   "
    f"iters={int(it)} rounds={int(rounds)} res={float(nrm):.2e}"
)
iters = int(it)
rounds_i = int(rounds)
model = iters * (t_v + t_apply) + rounds_i * t_df
log(
    f"model = iters*(V+apply) + rounds*DF = {model * 1e3:.1f} ms  "
    f"(unexplained {100 * (t_ir - model) / t_ir:.0f}%)"
)
log(f"roofline V-cycle (tables): see vcycle_cost_table")
log(patch_mg.vcycle_cost_table(struct, data))
print("DONE")
