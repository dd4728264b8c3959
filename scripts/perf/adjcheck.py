"""Numerical adjointness check: is MT ~= M_fwd^T?  Component-wise
<M x, y> vs <x, MT y> discrepancies isolate the broken surrogate."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

DIM, REFS, VISC = 2, 2, 0.05


def log(*a):
    print(*a, flush=True)


from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.ops import sparsity
from admm_optim_tpu.solvers import mg as mgmod
from admm_optim_tpu.solvers import ns_solver

cfg = ProblemConfig(dim=DIM, num_refs=REFS, visc=VISC)
prob = ObstacleShapeOpt(cfg)
X = prob.X0
s, it, nrm, conv = prob._ns_solve(X, prob.initial_state(X))
space = prob.ns_space

import types

_M_fn = None
for c in prob._ns_solve.__closure__ or ():
    v = c.cell_contents
    if isinstance(v, types.FunctionType) and v.__name__ == "_M_fn":
        _M_fn = v

fwd_args = prob._ns_pre(X, s=s)
adj_args = prob._ns_pre(X, s=s, adjoint=True)
M_fwd = lambda r: _M_fn(r, *fwd_args)
vel_fwd = ns_solver.patch_velocity_M(prob.pre_ps, prob._pre_struct_p, fwd_args[0])
vel_adj = ns_solver.patch_velocity_M(prob.pre_ps, prob._pre_struct_p, adj_args[0])
pre_data_adj, ap_adj, fp_adj, mp_adj, _ = adj_args
pre_data_f, ap_f, fp_f, mp_f, _ = fwd_args
MT = ns_solver.ns_pcd_MT(
    space, prob.pre_struct, pre_data_adj, prob.p_space, prob.p_struct,
    ap_adj, fp_adj, mp_adj, coords=X, visc=VISC, stab=cfg.stab, vel_M=vel_adj,
)

rng = np.random.default_rng(0)
n = space.n_state


def rel(a, b):
    return abs(a - b) / max(abs(a), abs(b), 1e-300)


x = jnp.asarray(rng.normal(size=n))
y = jnp.asarray(rng.normal(size=n))
log(f"full M: <Mx,y>={float(jnp.vdot(M_fwd(x), y)):.6e} "
    f"<x,MTy>={float(jnp.vdot(x, MT(y))):.6e} "
    f"rel={rel(float(jnp.vdot(M_fwd(x), y)), float(jnp.vdot(x, MT(y)))):.2e}")

# velocity block alone
rv = jnp.asarray(rng.normal(size=(space.dim, space.n_vel)))
wv = jnp.asarray(rng.normal(size=(space.dim, space.n_vel)))
a = float(jnp.vdot(vel_fwd(rv), wv))
b = float(jnp.vdot(rv, vel_adj(wv)))
log(f"vel block: {a:.6e} vs {b:.6e} rel={rel(a, b):.2e}")

# pressure Schur block alone: S~ = Mp^-1 Fp Ap^-1 vs S~^T = Ap^-1 FpT Mp^-1
pat = prob.p_space.fine_pattern
rp = jnp.asarray(rng.normal(size=space.n_pressure))
wp = jnp.asarray(rng.normal(size=space.n_pressure))
s_f = sparsity.spmv_flat(pat, fp_f, mgmod.vcycle(prob.p_struct, ap_f, rp)) / mp_f
s_t = mgmod.vcycle(prob.p_struct, ap_adj, sparsity.spmv_flat(pat, fp_adj, wp / mp_adj))
a = float(jnp.vdot(s_f, wp))
b = float(jnp.vdot(rp, s_t))
log(f"schur block: {a:.6e} vs {b:.6e} rel={rel(a, b):.2e}")

# Ap vcycle alone (should be ~self-adjoint)
a = float(jnp.vdot(mgmod.vcycle(prob.p_struct, ap_f, rp), wp))
b = float(jnp.vdot(rp, mgmod.vcycle(prob.p_struct, ap_adj, wp)))
log(f"Ap vcycle: {a:.6e} vs {b:.6e} rel={rel(a, b):.2e}")

# Fp vs FpT surrogate
a = float(jnp.vdot(sparsity.spmv_flat(pat, fp_f, rp), wp))
b = float(jnp.vdot(rp, sparsity.spmv_flat(pat, fp_adj, wp)))
log(f"Fp vs Fp(-w): {a:.6e} vs {b:.6e} rel={rel(a, b):.2e}")
print("DONE")

# exact transpose via jax.linear_transpose
import time
_, _mt_vjp = jax.vjp(M_fwd, jnp.zeros_like(x))
MT_exact = lambda y: _mt_vjp(y)
a = float(jnp.vdot(M_fwd(x), y))
b = float(jnp.vdot(x, MT_exact(y)[0]))
log(f"linear_transpose: {a:.6e} vs {b:.6e} rel={rel(a, b):.2e}")

from admm_optim_tpu.solvers.krylov import gmres
def R2(ss):
    return nsops.ns_residual(space, X, ss, VISC, cfg.stab)
_, vjp2 = jax.vjp(R2, s)
Jt = lambda v: vjp2(v)[0]
gJ = jax.grad(lambda ss: nsops.drag(space, X, ss, VISC))(s)
t0 = time.perf_counter()
res = gmres(Jt, -gJ, M=lambda r: MT_exact(r)[0], restart=240, max_iters=4800,
            abs_tol=1e-14, rel_tol=1e-9)
log(f"gmres[Jt, exact M^T, r=240]: iters={int(res.iters)} "
    f"res={float(res.res_norm):.2e} wall {time.perf_counter()-t0:.0f}s")
