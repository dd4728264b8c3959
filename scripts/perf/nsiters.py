"""Count GMRES iterations per Newton step on CPU (platform-independent):
pressure preconditioner mass vs pcd, across viscosities/sizes."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import time

import numpy as np


def log(*a):
    print(*a, flush=True)


from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.solvers import ns_solver

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
PPS = sys.argv[4:] or ["mass", "pcd"]

for pp in PPS:
    cfg = ProblemConfig(dim=DIM, num_refs=REFS, visc=VISC, pressure_precond=pp)
    t0 = time.perf_counter()
    prob = ObstacleShapeOpt(cfg)
    X = prob.X0
    s0 = prob.initial_state(X)
    log(f"[{pp}] dim={DIM} refs={REFS} visc={VISC} "
        f"ndofs={prob.ns_space.n_state} init {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter()
    s, it, nrm, conv = prob._ns_solve(X, s0, verbose=True)
    log(f"[{pp}] newton={int(it)} |R|={float(nrm):.2e} conv={bool(conv)} "
        f"wall {time.perf_counter()-t0:.0f}s")
print("DONE")
