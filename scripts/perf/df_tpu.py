import os, sys
os.environ.setdefault("JAX_PLATFORMS", "tpu,cpu")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
cpu = jax.devices("cpu")[0]
tpu = jax.devices("tpu")[0]
print("devices:", tpu, cpu)

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.patches import build_patchset
from admm_optim_tpu.ops import patchstencil as st
from admm_optim_tpu.ops import df
from admm_optim_tpu.ops.deformation import deformation_corner_mats, deformation_elem_mats
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.ops.p1space import P1VectorSpace
from admm_optim_tpu.solvers import patch_mg

# 1) EFT primitives exact on TPU under jit inside a fused expression
rng = np.random.default_rng(0)
a_h = (rng.normal(size=4096) * 10.0 ** rng.integers(-3, 3, size=4096)).astype(np.float32)
b_h = rng.normal(size=4096).astype(np.float32)
@jax.jit
def fused(a, b):
    # surround with elementwise work so XLA fuses aggressively
    a = a * 1.0 + 0.0
    s, e = df.two_sum(a, b)
    p, q = df.two_prod(a, b)
    return s * 1.0, e * 1.0, p * 1.0, q * 1.0
a_t = jax.device_put(jnp.asarray(a_h), tpu); b_t = jax.device_put(jnp.asarray(b_h), tpu)
s, e, p, q = [np.asarray(x, np.float64) for x in jax.device_get(fused(a_t, b_t))]
err_sum = np.max(np.abs((s + e) - (a_h.astype(np.float64) + b_h.astype(np.float64))))
err_prod = np.max(np.abs((p + q) - (a_h.astype(np.float64) * b_h.astype(np.float64))))
print(f"two_sum exactness err: {err_sum:.3e}")
print(f"two_prod exactness err: {err_prod:.3e}")
assert err_sum == 0.0 and err_prod == 0.0, "EFT identities broken on TPU!"

# 2) residual_df on TPU vs f64 truth on CPU backend
levels = [geomgen.channel_2d(n_side=(3, 1), diag="fixed")]
for _ in range(3):
    levels.append(refine(levels[-1]))
hier = Hierarchy(levels); ps = build_patchset(hier); fine = hier.fine
coords = jnp.asarray(fine.coords, jnp.float32)
space = P1VectorSpace.build(hier)
pat0 = space.patterns[0]; fixed0 = np.asarray(space.fixed[0])
def base_dense_fn(c0):
    em0 = deformation_elem_mats(c0, jnp.asarray(hier.levels[0].elems), 1.0, 1.0, 1.0)
    v0 = sparsity.assemble_values(pat0, em0)
    v0 = sparsity.bake_dirichlet(pat0, v0, jnp.asarray(fixed0))
    return jnp.linalg.inv(sparsity.to_dense(pat0, v0).astype(jnp.float32))
struct = patch_mg.PatchMGStructure(ps)
with jax.default_device(tpu):
    tabs = patch_mg.make_level_tables(ps, jnp.float32)
    data = patch_mg.assemble_patch_mg(ps, struct, jax.device_put(coords, tpu),
                                      lambda c: deformation_corner_mats(c, 1.0, 1.0, 1.0),
                                      base_dense_fn, tabs=tabs)
    bg = jnp.asarray(rng.normal(size=(2, fine.num_vertices)), jnp.float32) * space.free_mask().astype(jnp.float32)
    b = st.to_patch(ps.fine, bg)
    xh = patch_mg.cg_p(struct, data, b, max_iters=60, rel_tol=1e-4).x
    xl = jnp.zeros_like(xh)
    rj = jax.jit(lambda d, b, xh, xl: patch_mg.residual_df(struct, d, b, xh, xl))(data, b, xh, xl)

# f64 truth on CPU
with jax.default_device(cpu):
    tabs64 = patch_mg.make_level_tables(ps, jnp.float64)
    W64 = jax.device_put(np.asarray(data.W[ps.k], np.float64), cpu)
    xh64 = jax.device_put(np.asarray(xh, np.float64), cpu)
    b64 = jax.device_put(np.asarray(b, np.float64), cpu)
    y64 = st.exchange_sum(None, st.apply_w(ps, W64, xh64), tabs64[ps.k])
    r64 = (b64 - y64) * tabs64[ps.k].free[None]
    err = float(jnp.max(jnp.abs(np.asarray(rj[0], np.float64) + np.asarray(rj[1], np.float64) - r64)))
rnorm = float(jnp.max(jnp.abs(r64)))
print(f"residual_df vs f64 truth: abs {err:.3e} (resid scale {rnorm:.3e})")

# 3) full IR solve on TPU: converge to 1e-9, then f64-verify
with jax.default_device(tpu):
    res = jax.jit(lambda d, b: patch_mg.cg_ir_p(struct, d, b, rel_tol=1e-9, max_rounds=8, inner_rel=1e-4, inner_iters=60))(data, b)
print(f"cg_ir rounds={int(res.rounds)} reported res={float(res.res_norm):.2e} conv={bool(res.converged)}")
with jax.default_device(cpu):
    x64 = jax.device_put(np.asarray(res.x_hi, np.float64) + np.asarray(res.x_lo, np.float64), cpu)
    y64 = st.exchange_sum(None, st.apply_w(ps, W64, x64), tabs64[ps.k])
    r64 = (b64 - y64) * tabs64[ps.k].free[None]
    true_rel = float(jnp.linalg.norm(r64.ravel()) / jnp.linalg.norm(b64.ravel()))
print(f"true f64 relative residual: {true_rel:.3e}")
assert true_rel < 1e-8, "IR failed to reach 1e-8 true residual on TPU"
print("ALL TPU DF CHECKS PASSED")
