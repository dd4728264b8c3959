"""Adjoint solve: fair restart comparison + forward-system control."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time

import jax.numpy as jnp

DIM, REFS, VISC = 2, 2, 0.05


def log(*a):
    print(*a, flush=True)


from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.solvers import ns_solver
from admm_optim_tpu.solvers.krylov import gmres

cfg = ProblemConfig(dim=DIM, num_refs=REFS, visc=VISC)
prob = ObstacleShapeOpt(cfg)
X = prob.X0
s, it, nrm, conv = prob._ns_solve(X, prob.initial_state(X))
log(f"NS converged: {bool(conv)}")
space = prob.ns_space


def R(ss):
    return nsops.ns_residual(space, X, ss, VISC, cfg.stab)


_, vjp = jax.vjp(R, s)
Jt = lambda x: vjp(x)[0]
Jv = lambda x: jax.jvp(R, (s,), (x,))[1]
gJ = jax.grad(lambda ss: nsops.drag(space, X, ss, VISC))(s)

import types

_M_fn = None
for c in prob._ns_solve.__closure__ or ():
    v = c.cell_contents
    if isinstance(v, types.FunctionType) and v.__name__ == "_M_fn":
        _M_fn = v

fwd_args = prob._ns_pre(X, s=s)
M_fwd = lambda r: _M_fn(r, *fwd_args)

adj_args = prob._ns_pre(X, s=s, adjoint=True)
vel_M = (
    ns_solver.patch_velocity_M(prob.pre_ps, prob._pre_struct_p, adj_args[0])
    if prob.use_patch_ns
    else None
)
pre_data_adj, ap_adj, fp_adj, mp_adj, _ = adj_args
MT = ns_solver.ns_pcd_MT(
    space, prob.pre_struct, pre_data_adj, prob.p_space, prob.p_struct,
    ap_adj, fp_adj, mp_adj, coords=X, visc=VISC, stab=cfg.stab, vel_M=vel_M,
)
Mdiag = nsops.diag_preconditioner(space, X, VISC)

for name, A, M, rst in (
    ("fwd J, M_pcd", Jv, M_fwd, 240),
    ("adj Jt, MT", Jt, MT, 240),
    ("adj Jt, diag", Jt, Mdiag, 240),
):
    t0 = time.perf_counter()
    res = gmres(A, -gJ, M=M, restart=rst, max_iters=4800,
                abs_tol=1e-14, rel_tol=1e-9)
    log(f"[{name}, r={rst}] iters={int(res.iters)} "
        f"res={float(res.res_norm):.2e} wall {time.perf_counter()-t0:.0f}s")
print("DONE")
