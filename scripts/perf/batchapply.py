"""Does the vmapped x-update amortize W streaming over the 1+m rhs?
Times at 3D refs=N: single apply_w, vmap(apply_w) B=5, a manual
broadcast-batched XLA apply (W read once), vmap(vcycle), 5x vcycle.
Usage: python scripts/perf/batchapply.py [refs]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
import bench
from admm_optim_tpu.ops import patchstencil as pst
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.deformation import deformation_corner_block_fn, deformation_elem_mats
from admm_optim_tpu.solvers import patch_mg

def log(*a): print(*a, flush=True)

hier, ps = bench.get_mesh(REFS)
fine = hier.fine; dim = hier.dim
coords = jnp.asarray(fine.coords)
lvl0 = hier.levels[0]
pat0 = sparsity.build_pattern(lvl0.elems, lvl0.num_vertices, dim)
fixed0 = np.repeat(lvl0.vertex_mask(("inlet","wall","outlet"))[None], dim, 0)
def base_dense_fn(c0):
    em0 = deformation_elem_mats(c0, jnp.asarray(lvl0.elems), 1.,1.,1.)
    v0 = sparsity.assemble_values(pat0, em0)
    v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
    return jnp.linalg.inv(sparsity.to_dense(pat0, v0))
struct = patch_mg.PatchMGStructure(ps, pre_smooth=2, post_smooth=2, cheb_lower=0.2)
tabs = patch_mg.make_level_tables(ps, coords.dtype)
data = jax.jit(lambda c,t: patch_mg.assemble_patch_mg(ps, struct, c,
    deformation_corner_block_fn(1.,1.,1.), base_dense_fn, tabs=t, sym=True))(coords, tabs)
float(data.lmax[-1])
log(f"refs={REFS} assembled")

B = 5
rng = np.random.default_rng(0)
x1 = jnp.asarray(rng.normal(size=(dim,)+ps.fine.lat_shape+(ps.P,)), coords.dtype)
xB = jnp.asarray(rng.normal(size=(B,dim)+ps.fine.lat_shape+(ps.P,)), coords.dtype)

def timeit(name, f, *args, reps=10):
    y = f(*args); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps): y = f(*args)
    jax.block_until_ready(y)
    log(f"{name:>28}: {(time.perf_counter()-t0)/reps*1e3:8.2f} ms")

W = data.W[ps.k]
timeit("apply_w single", jax.jit(lambda d, x: pst.apply_w(ps, d.W[ps.k], x)), data, x1)
timeit("vmap apply_w B=5", jax.jit(lambda d, x: jax.vmap(lambda xx: pst.apply_w(ps, d.W[ps.k], xx))(x)), data, xB)

# manual broadcast-batched XLA sym apply: W read once, windows per lane
def apply_w_batched(Ws, xb):
    # Ws sym (H,C,C,*lat,P); xb (B,C,*lat,P)
    kept = pst.half_slots(ps)
    H = len(kept); C = xb.shape[1]
    lat = xb.shape[2:2+dim]
    pad = [(0,0),(0,0)]+[(1,1)]*dim+[(0,0)]
    xp = jnp.pad(xb, pad)
    ws = []
    for h in range(H):
        o = ps.stencil[kept[h]]
        sl = (slice(None),slice(None)) + tuple(slice(1+int(v),1+int(v)+n) for v,n in zip(o,lat)) + (slice(None),)
        ws.append(xp[sl])
    xw = jnp.stack(ws, 0)  # (H,B,C,*lat,P)
    Wf = Ws[:, None]       # (H,1,C,C,*lat,P)
    y = jnp.sum(Wf * xw[:, :, None], axis=(0, 3))  # direct half: (B,C,*lat,P)
    for h in range(1, H):
        o = ps.stencil[kept[h]]
        z = jnp.sum(Ws[h][None] * xb[:, :, None], axis=1)  # (B,C,*lat,P) W^T x
        y = y + jax.vmap(lambda zz: pst.shift_read(zz, [-int(v) for v in o], lat_axes_offset=1))(z)
    return y
timeit("batched XLA sym B=5", jax.jit(lambda d, x: apply_w_batched(d.W[ps.k], x)), data, xB)

timeit("vcycle single", jax.jit(lambda d, x: patch_mg.vcycle_p(struct, d, x)), data, x1)
timeit("vmap vcycle B=5", jax.jit(lambda d, x: jax.vmap(lambda xx: patch_mg.vcycle_p(struct, d, xx))(x)), data, xB)
log("DONE")
