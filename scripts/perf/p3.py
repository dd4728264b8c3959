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
from admm_optim_tpu.ops.deformation import deformation_corner_block_fn, deformation_elem_mats
from admm_optim_tpu.solvers import patch_mg
REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
with open(os.path.expanduser(f"~/.cache/jax_admm/host_mesh_3d_refs{REFS}_v3.pkl"), "rb") as f:
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
    ps, struct, c, deformation_corner_block_fn(1.0, 1.0, 1.0),
    base_dense_fn, tabs=tabs, sym=True))
data = assemble(coords, tabs)
float(data.lmax[-1]); log("assembled")
rng = np.random.default_rng(0)
free_g = ~fine.vertex_mask(("inlet", "wall", "outlet"))
b_g = jnp.asarray(rng.normal(size=(hier.dim, fine.num_vertices)), coords.dtype)
b_g = b_g * jnp.asarray(free_g, coords.dtype)[None]
x = st.to_patch(ps.fine, b_g)
tab = tabs[ps.k]
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
for name, fn, n, args in [
    ("apply", lambda v, d: st.apply_w(ps, d.W[ps.k], v), 100, (data,)),
    ("vcycle", lambda v, d: patch_mg.vcycle_p(struct, d, v), 30, (data,)),
    ("apply_df", lambda v, d: st.apply_w_df(ps, d.W[ps.k], v, v*1e-7)[0], 20, (data,)),
    ("exch_df", lambda v, d: st.exchange_sum_df(d.tabs[ps.k], v, v*1e-7)[0], 20, (data,)),
    ("residual_df", lambda v, d: patch_mg.residual_df(struct, d, v, v, v*1e-7)[0], 20, (data,)),
]:
    per, first = chain(fn, n, *args)
    log(f"refs={REFS} {name}: {per*1e3:.3f} ms (first {first:.1f}s)")
@jax.jit
def solve(data, b):
    res = patch_mg.cg_ir_p(struct, data, b, rel_tol=1e-8, max_rounds=6, inner_rel=1e-5, inner_iters=60)
    return res.inner_iters, res.res_norm, res.converged
t0=time.perf_counter(); out=solve(data, x); [float(v) for v in out]; t1=time.perf_counter()
t0b=time.perf_counter(); out=solve(data, x); [float(v) for v in out]
log(f"refs={REFS} IR solve: {time.perf_counter()-t0b:.3f}s (first {t1-t0:.1f}s) iters={int(out[0])} res={float(out[1]):.2e}")
@jax.jit
def solve32(data, b):
    res = patch_mg.cg_p(struct, data, b, max_iters=60, rel_tol=1e-5)
    return res.iters, res.res_norm
t0=time.perf_counter(); o2=solve32(data, x); [float(v) for v in o2]; t1=time.perf_counter()
t0b=time.perf_counter(); o2=solve32(data, x); [float(v) for v in o2]
log(f"refs={REFS} f32 CG(1e-5): {time.perf_counter()-t0b:.3f}s (first {t1-t0:.1f}s) iters={int(o2[0])}")
