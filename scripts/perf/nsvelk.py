"""Velocity-block strength ablation: K-step V-cycle-preconditioned
Richardson as the velocity action inside the NS block preconditioner.
Counts outer GMRES iterations (platform-independent) on CPU."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time

import jax.numpy as jnp

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02
PP = sys.argv[4] if len(sys.argv) > 4 else "pcd"
KS = [int(v) for v in sys.argv[5:]] or [1, 2, 3]


def log(*a):
    print(*a, flush=True)


from admm_optim_tpu.ops import patchstencil as pst
from admm_optim_tpu.solvers import ns_solver
from admm_optim_tpu.solvers import patch_mg as pmg

orig_vel_M = ns_solver.patch_velocity_M
K = 1


def vel_M_k(pre_ps, pre_struct_p, pre_data):
    tab = pre_data.tabs[pre_ps.k]
    W = pre_data.W[-1]

    def zv_fn(rv):
        free = tab.free[None].astype(rv.dtype)
        b_p = pst.to_patch(pre_ps.fine, rv)
        bf = b_p * free
        z = pmg.vcycle_p(pre_struct_p, pre_data, bf)
        for _ in range(K - 1):
            Az = pmg._apply(pre_ps, tab, W, z)
            z = z + pmg.vcycle_p(pre_struct_p, pre_data, (bf - Az) * free)
        z = z + b_p * (1.0 - free)
        return pst.from_patch(pre_ps.fine, z, rv.shape[1], mode="owner")

    return zv_fn


ns_solver.patch_velocity_M = vel_M_k

from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig

for k in KS:
    K = k
    cfg = ProblemConfig(dim=DIM, num_refs=REFS, visc=VISC, pressure_precond=PP)
    prob = ObstacleShapeOpt(cfg)
    assert prob.use_patch_ns, "needs the patch NS backend"
    X = prob.X0
    s0 = prob.initial_state(X)
    t0 = time.perf_counter()
    s, it, nrm, conv = prob._ns_solve(X, s0, verbose=True)
    log(f"[K={k}] newton={int(it)} |R|={float(nrm):.2e} conv={bool(conv)} "
        f"wall {time.perf_counter()-t0:.0f}s")
print("DONE")
