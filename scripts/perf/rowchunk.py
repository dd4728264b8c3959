import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp, numpy as np
from admm_optim_tpu.core.mesh import build_hierarchy_3d, build_hierarchy
from admm_optim_tpu.core.patches import build_patchset
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops.deformation import deformation_corner_block_fn

for dim, refs in [(2, 3), (3, 2)]:
    hier = build_hierarchy(refs) if dim == 2 else build_hierarchy_3d(refs)
    ps = build_patchset(hier)
    fine = hier.fine
    coords_p = st.to_patch(ps.fine, jnp.asarray(fine.coords).T)
    fn = deformation_corner_block_fn(1.0, 1.0, 1.0)
    free = jnp.asarray(ps.fine.free)
    W0 = st.assemble_w(ps, ps.k, coords_p, fn, sym=True, free=free)
    m = ps.fine.m
    for rc in [m // 2, max(1, m // 4)]:
        W1 = st.assemble_w(ps, ps.k, coords_p, fn, sym=True, free=free, row_chunk=rc)
        err = float(jnp.max(jnp.abs(W1 - W0)))
        print(f"dim={dim} m={m} rc={rc}: max|dW|={err:.2e}", flush=True)
        assert err < 1e-10, err
print("ROWCHUNK OK")
