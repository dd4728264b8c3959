"""Adjoint (J^T) solve iteration counts: diagonal surrogate (current)
vs transposed block preconditioners at the converged NS state."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time

import jax.numpy as jnp

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05


def log(*a):
    print(*a, flush=True)


from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.ops import navier_stokes as nsops
from admm_optim_tpu.solvers import ns_solver
from admm_optim_tpu.solvers.krylov import gmres

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

# candidate preconditioners
import types

_M_fn = None
for c in prob._ns_solve.__closure__ or ():
    v = c.cell_contents
    if isinstance(v, types.FunctionType) and v.__name__ == "_M_fn":
        _M_fn = v

adj_args = prob._ns_pre(X, s=s, adjoint=True)
vel_M = (
    ns_solver.patch_velocity_M(prob.pre_ps, prob._pre_struct_p, adj_args[0])
    if prob.use_patch_ns
    else None
)
if cfg.pressure_precond == "pcd":
    pre_data_adj, ap_adj, fp_adj, mp_adj, _ = adj_args
    MT = ns_solver.ns_pcd_MT(
        space, prob.pre_struct, pre_data_adj, prob.p_space, prob.p_struct,
        ap_adj, fp_adj, mp_adj, coords=X, visc=VISC, stab=cfg.stab,
        vel_M=vel_M,
    )
    MT_diagless = ns_solver.ns_pcd_MT(
        space, prob.pre_struct, pre_data_adj, prob.p_space, prob.p_struct,
        ap_adj, fp_adj, mp_adj, vel_M=vel_M,
    )
else:
    pre_data_adj, pdiag_adj, _ = adj_args
    MT = ns_solver.ns_gmg_MT(
        space, prob.pre_struct, pre_data_adj, pdiag_adj,
        coords=X, visc=VISC, stab=cfg.stab, vel_M=vel_M,
    )
    MT_diagless = ns_solver.ns_gmg_MT(
        space, prob.pre_struct, pre_data_adj, pdiag_adj, vel_M=vel_M,
    )

cands = {
    "MT_tri": MT,
    "MT_blockdiag": MT_diagless,
    "diag": nsops.diag_preconditioner(space, X, VISC),
    # forward block M at the converged state (wrong transpose, maybe ok)
    "fwd_block": lambda r: _M_fn(r, *prob._ns_pre(X, s=s)),
}
for name, M in cands.items():
    t0 = time.perf_counter()
    res = gmres(Jt, -gJ, M=M, restart=2 * ns.lin_restart,
                max_iters=4 * ns.lin_max_iters, abs_tol=ns.lin_abs_tol,
                rel_tol=ns.adj_rel_tol)
    log(f"[{name}] iters={int(res.iters)} res={float(res.res_norm):.2e} "
        f"wall {time.perf_counter()-t0:.0f}s")
print("DONE")
