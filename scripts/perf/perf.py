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
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.deformation import deformation_corner_mats, deformation_elem_mats
from admm_optim_tpu.solvers import patch_mg
REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
with open(os.path.expanduser(f"~/.cache/jax_admm/host_mesh_3d_refs{REFS}_v2.pkl"), "rb") as f:
    hier, ps = pickle.load(f)
fine = hier.fine
coords = jnp.asarray(fine.coords)
lvl0 = hier.levels[0]
pat0 = sparsity.build_pattern(lvl0.elems, lvl0.num_vertices, hier.dim)
fixed0 = np.repeat(lvl0.vertex_mask(("inlet", "wall", "outlet"))[None], hier.dim, axis=0)
def base_dense_fn(c0):
    em0 = deformation_elem_mats(c0, jnp.asarray(lvl0.elems), 1.0, 1.0, 1.0)
    v0 = sparsity.assemble_values(pat0, em0)
    v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
    return jnp.linalg.inv(sparsity.to_dense(pat0, v0))
struct = patch_mg.PatchMGStructure(ps)
tabs = patch_mg.make_level_tables(ps, coords.dtype)
assemble = jax.jit(lambda c, tabs: patch_mg.assemble_patch_mg(
    ps, struct, c, lambda x: deformation_corner_mats(x, 1.0, 1.0, 1.0),
    base_dense_fn, tabs=tabs))
data = assemble(coords, tabs)
float(data.lmax[-1]); log("assembled")
rng = np.random.default_rng(0)
free_g = ~fine.vertex_mask(("inlet", "wall", "outlet"))
b_g = jnp.asarray(rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype)
b_g = b_g * jnp.asarray(free_g, coords.dtype)[None]
x = st.to_patch(ps.fine, b_g)
tab = tabs[ps.k]
W = data.W[ps.k]
def chain(fn, n, *args):
    @jax.jit
    def run(x, *args):
        def body(i, x):
            y = fn(x, *args)
            return y / (1.0 + jnp.sqrt(jnp.sum(y * y)))
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))  # feedback chain
    t0 = time.perf_counter(); float(run(x, *args)); t1 = time.perf_counter()
    t0b = time.perf_counter(); float(run(x, *args)); t2 = time.perf_counter()
    return (t2 - t0b) / n, t1 - t0
n_dofs = fine.num_vertices * hier.dim
for name, fn, n, args in [
    ("apply_w", lambda v, W, tab: st.apply_w(ps, W, v), 100, (W, tab)),
    ("apply+exchange", lambda v, W, tab: st.exchange_sum(None, st.apply_w(ps, W, v), tab), 100, (W, tab)),
    ("exchange", lambda v, W, tab: st.exchange_sum(None, v, tab), 100, (W, tab)),
    ("vcycle", lambda v, data: patch_mg.vcycle_p(struct, data, v), 20, (data,)),
    ("apply_df", lambda v, W, tab: st.exchange_sum_df(tab, *st.apply_w_df(ps, W, v, v*1e-7))[0], 20, (W, tab)),
]:
    per, first = chain(fn, n, *args)
    log(f"refs={REFS} {name}: {per*1e3:.3f} ms/op (first {first:.1f}s) [{n_dofs/per/1e9:.3f} GDoF/s]")
per, first = chain(lambda v, W, tab: st.apply_w_df(ps, W, v, v*1e-7)[0], 20, W, tab)
log(f"refs={REFS} apply_df_only: {per*1e3:.3f} ms/op (first {first:.1f}s)")
per, first = chain(lambda v, W, tab: st.exchange_sum_df(tab, v, v*1e-7)[0], 20, W, tab)
log(f"refs={REFS} exchange_df_only: {per*1e3:.3f} ms/op (first {first:.1f}s)")
