"""Adjoint solve deep-dive: RHS scale, BiCGStab vs GMRES, longer budgets,
free-subspace restriction."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time

import jax.numpy as jnp
import numpy as np

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05


def log(*a):
    print(*a, flush=True)


from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.solvers import ns_solver
from admm_optim_tpu.solvers.krylov import bicgstab, gmres

cfg = ProblemConfig(dim=DIM, num_refs=REFS, visc=VISC)
prob = ObstacleShapeOpt(cfg)
X = prob.X0
s0 = prob.initial_state(X)
s, it, nrm, conv = prob._ns_solve(X, s0)
log(f"NS converged: {bool(conv)} |R|={float(nrm):.2e}")
space = prob.ns_space
ns = cfg.ns


def R(ss):
    return nsops.ns_residual(space, X, ss, VISC, cfg.stab)


_, vjp = jax.vjp(R, s)
Jt = lambda x: vjp(x)[0]
gJ = jax.grad(lambda ss: nsops.drag(space, X, ss, VISC))(s)
log(f"|gJ| = {float(jnp.linalg.norm(gJ)):.3e}  n={gJ.shape[0]}")

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

for name, M in (("MT", MT), ("diag", Mdiag)):
    t0 = time.perf_counter()
    res = bicgstab(Jt, -gJ, M=M, max_iters=2000, abs_tol=1e-14,
                   rel_tol=1e-9)
    log(f"bicgstab[{name}]: iters={int(res.iters)} res={float(res.res_norm):.2e} "
        f"conv={bool(res.converged)} wall {time.perf_counter()-t0:.0f}s")

# gmres long, small restart vs big restart
for name, M, rst in (("MT", MT, 60), ("diag", Mdiag, 240)):
    t0 = time.perf_counter()
    res = gmres(Jt, -gJ, M=M, restart=rst, max_iters=4800,
                abs_tol=1e-14, rel_tol=1e-9)
    log(f"gmres[{name},r={rst}]: iters={int(res.iters)} "
        f"res={float(res.res_norm):.2e} wall {time.perf_counter()-t0:.0f}s")
print("DONE")
