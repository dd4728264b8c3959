import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import dataclasses

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.patches import build_patchset
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.convdiff import convdiff_corner_mats, convdiff_elem_mats
from admm_optim_tpu.ops.p1space import P1VectorSpace
from admm_optim_tpu.solvers import patch_mg as pmg

dim = 2
levels = [geomgen.channel_2d(diag="fixed")]
for _ in range(2):
    levels.append(refine(levels[-1]))
hier = Hierarchy(levels)
ns_dir = ("inlet", "wall", "obstacle_surface")
ps = build_patchset(hier, dirichlet=ns_dir)
fine = hier.fine
coords = jnp.asarray(fine.coords)
rng = np.random.default_rng(0)
w = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)))
visc = 0.05

# ---- operator equality: patch W apply vs ELL spmv -------------------------
space = P1VectorSpace.build(hier, dirichlet=ns_dir)
pat = space.patterns[-1]
em = convdiff_elem_mats(coords, jnp.asarray(fine.elems), w, visc)
vals = sparsity.assemble_values(pat, em)
vals = sparsity.bake_dirichlet(pat, vals, jnp.asarray(space.fixed[-1]))

cw = jnp.concatenate([coords.T, w], axis=0)
cw_p = st.to_patch(ps.fine, cw)
k = ps.k
W = st.assemble_w(ps, k, cw_p, lambda c: convdiff_corner_mats(c, visc))
tabs = pmg.make_level_tables(ps, coords.dtype)
W = st.bake_dirichlet_w(ps, k, W, free=tabs[k].free.astype(W.dtype))

x_g = jnp.asarray(rng.normal(size=(dim, fine.num_vertices)))
free_g = ~fine.vertex_mask(ns_dir)
x_g = x_g * jnp.asarray(free_g, x_g.dtype)[None]
y_ell = sparsity.spmv_cn(pat, vals, x_g) * jnp.asarray(free_g, x_g.dtype)[None]
x_p = st.to_patch(ps.fine, x_g)
y_p = st.exchange_sum(None, st.apply_w(ps, W, x_p), tabs[k]) * tabs[k].free[None]
y_pg = st.from_patch(ps.fine, y_p, fine.num_vertices, mode="owner")
err = float(jnp.max(jnp.abs(y_pg - y_ell)) / jnp.max(jnp.abs(y_ell)))
print(f"convdiff patch-vs-ELL operator rel err: {err:.3e}")
assert err < 1e-12

# ---- full model NS solve, both backends -----------------------------------
from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig

for backend in ("global", "auto"):
    cfg = ProblemConfig(dim=2, num_refs=1, visc=0.05, backend=backend)
    prob = ObstacleShapeOpt(cfg)
    print(f"backend={backend}: use_patch_ns={getattr(prob, 'use_patch_ns', None)}")
    X = prob.X0
    s0 = prob.initial_state(X)
    s, it, nrm, conv = prob._ns_solve(X, s0)
    print(f"  newton iters={int(it)} |R|={float(nrm):.3e} converged={bool(conv)}")
print("OK")
