import sys, os
import jax, jax.numpy as jnp, numpy as np
def log(*a): print(*a, file=sys.stderr, flush=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import pickle
from admm_optim_tpu.ops import patchstencil as st
REFS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
with open(os.path.expanduser(f"~/.cache/jax_admm/host_mesh_3d_refs{REFS}_v3.pkl"), "rb") as f:
    hier, ps = pickle.load(f)
lvl = ps.fine
H = len(st.half_slots(ps))
lat = tuple(n + 1 for n in (lvl.m,) * ps.dim)
P = lvl.gid.shape[0]
Wshape = (H, ps.dim, ps.dim) + lat + (P,)
xshape = (ps.dim,) + lat + (P,)
log("W", Wshape, np.prod(Wshape) * 4 / 2**30, "GiB; x", xshape, np.prod(xshape) * 4 / 2**30, "GiB")
f = jax.jit(lambda W, xh, xl: st.apply_w_df(ps, W, xh, xl))
W = jax.ShapeDtypeStruct(Wshape, jnp.float32)
x = jax.ShapeDtypeStruct(xshape, jnp.float32)
comp = f.lower(W, x, x).compile()
ma = comp.memory_analysis()
log("args", ma.argument_size_in_bytes / 2**30, "out", ma.output_size_in_bytes / 2**30,
    "temp", ma.temp_size_in_bytes / 2**30, "GiB")
