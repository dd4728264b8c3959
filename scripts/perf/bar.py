import os, sys
os.environ["JAX_PLATFORMS"]="cpu"
import admm_optim_tpu.ops.df as dfmod
mode = sys.argv[1] if len(sys.argv) > 1 else "full"
if mode == "none":
    dfmod._ob = lambda x: x
import jax
jax.config.update("jax_platforms","cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.patches import build_patchset
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops import sparsity, df
from admm_optim_tpu.ops.deformation import deformation_corner_mats, deformation_elem_mats
from admm_optim_tpu.ops.p1space import P1VectorSpace
from admm_optim_tpu.solvers import patch_mg

levels=[geomgen.channel_2d(n_side=(3,1),diag="fixed")]
for _ in range(2): levels.append(refine(levels[-1]))
hier=Hierarchy(levels); ps=build_patchset(hier); fine=hier.fine
coords=jnp.asarray(fine.coords, jnp.float32)
space=P1VectorSpace.build(hier)
pat0=space.patterns[0]; fixed0=np.asarray(space.fixed[0])
def base_dense_fn(c0):
    em0=deformation_elem_mats(c0, jnp.asarray(hier.levels[0].elems),1.0,1.0,1.0)
    v0=sparsity.assemble_values(pat0, em0)
    v0=sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
    return jnp.linalg.inv(sparsity.to_dense(pat0, v0).astype(jnp.float32))
struct=patch_mg.PatchMGStructure(ps)
tabs=patch_mg.make_level_tables(ps, jnp.float32)
data=patch_mg.assemble_patch_mg(ps, struct, coords, lambda c: deformation_corner_mats(c,1.0,1.0,1.0), base_dense_fn, tabs=tabs)
rng=np.random.default_rng(3)
bg=jnp.asarray(rng.normal(size=(2, fine.num_vertices)), jnp.float32)*space.free_mask().astype(jnp.float32)
b=st.to_patch(ps.fine, bg)
tab=data.tabs[ps.k]
xh = patch_mg.cg_p(struct, data, b, max_iters=60, rel_tol=1e-4).x
xl = jnp.zeros_like(xh)
# f64 truth
tabs64=patch_mg.make_level_tables(ps, jnp.float64)
W64=data.W[ps.k].astype(jnp.float64)
y64=st.exchange_sum(None, st.apply_w(ps, W64, xh.astype(jnp.float64)), tabs64[ps.k])
r64=(b.astype(jnp.float64)-y64)*tabs64[ps.k].free[None]
rj = jax.jit(lambda d, b, xh, xl: patch_mg.residual_df(struct, d, b, xh, xl))(data, b, xh, xl)
e = float(jnp.max(jnp.abs(rj[0].astype(jnp.float64)+rj[1].astype(jnp.float64) - r64)))
print(f"mode={mode}: jit residual vs f64 truth: {e:.3e}")
res = jax.jit(lambda d, b: patch_mg.cg_ir_p(struct, d, b, rel_tol=1e-9, max_rounds=8, inner_rel=1e-4, inner_iters=60))(data, b)
print(f"mode={mode}: cg_ir rounds={int(res.rounds)} res={float(res.res_norm):.2e} conv={bool(res.converged)}")
