"""Adjoint-solve cost on the flagship unstructured grid (3D refs=2,
box_3D_elongated.ugx, visc=0.02), resuming the committed trajectory state.

Measures the r5 assembled-ELL-Jacobian + scatter-free transposed
preconditioner against the r4 baseline (312 ms/adjoint iteration, matrix-
free vjp + scatter-heavy vjp'd V-cycle; docs/ROADMAP.md round-4 log).

Usage:  REF5_JAC=auto|off python scripts/perf/elladj.py [ckpt] [visc]
(runs on the TPU; ~one adjoint solve + one forward re-solve)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "docs/trajectories/ref3d_refs2_tpu/checkpoint.npz"
VISC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
GRID = "/root/reference/grids/box_3D_elongated.ugx"
JAC = os.environ.get("REF5_JAC", "auto")

_t0 = time.perf_counter()
_probe = jax.jit(lambda x: x + 1.0)(jnp.ones((8,), jnp.float32))
assert float(_probe[0]) == 2.0
print(f"device up ({jax.devices()[0].platform}, {time.perf_counter()-_t0:.1f}s)",
      flush=True)

from admm_optim_tpu.models.obstacle import (  # noqa: E402
    ObstacleShapeOpt, ProblemConfig, f32_presets,
)
from admm_optim_tpu.optim import admm  # noqa: E402

def _cached_hier(grid, refs):
    """Pickle-cached refinement hierarchy (same key as run_reference_3d)."""
    import hashlib
    import pickle

    from admm_optim_tpu.core.mesh import Hierarchy

    cdir = os.path.expanduser("~/.cache/jax_admm")
    os.makedirs(cdir, exist_ok=True)
    key = hashlib.sha1(f"{grid}:{refs}".encode()).hexdigest()[:12]
    path = os.path.join(cdir, f"ref3d_hier_{key}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    h = Hierarchy.from_ugx(grid, refs)
    with open(path + ".tmp", "wb") as f:
        pickle.dump(h, f)
    os.replace(path + ".tmp", path)
    return h

z = np.load(CKPT, allow_pickle=True)
X = jnp.asarray(z["X"])
s = jnp.asarray(z["s"])
print(f"checkpoint: step {int(z['step'])} X{X.shape} s{s.shape}", flush=True)

cfg = ProblemConfig(
    dim=3, num_refs=2, grid_path=GRID, visc=VISC, backend="global",
    ns_assembled_jac=JAC,
    admm=admm.ADMMConfig(admm_steps=40, ns_max_its=8, tau=2.0,
                         lin_max_iters=250, x_solver="cg"),
)
cfg = f32_presets(cfg)
tb = time.perf_counter()
hier = _cached_hier(GRID, 2)
model = ObstacleShapeOpt(cfg, hier=hier)
print(f"model built ({time.perf_counter()-tb:.1f}s) "
      f"use_ell_jac={getattr(model, 'use_ell_jac', False)}", flush=True)

os.environ["ADJ_DEBUG"] = "1"

if getattr(model, "use_ns_jac", False):
    t = time.perf_counter()
    W = model._ns_jac_jit(X, s, cfg.visc)
    jax.block_until_ready(W)
    t_compile = time.perf_counter() - t
    t = time.perf_counter()
    W = model._ns_jac_jit(X, s, cfg.visc)
    jax.block_until_ready(W)
    print(f"W assembly: {time.perf_counter()-t:.2f}s warm "
          f"({t_compile:.1f}s incl compile); "
          f"{W.size*W.dtype.itemsize/1e6:.0f} MB", flush=True)

REPS = int(os.environ.get("REF5_REPS", "2"))
for rep in range(REPS):
    t = time.perf_counter()
    lam, rn, its = model._adjoint(X, s)
    jax.block_until_ready(lam)
    dt = time.perf_counter() - t
    its = int(its)
    print(f"ADJOINT[{rep}]: {dt:.1f}s, {its} its, |r|={float(rn):.3e}, "
          f"{1e3*dt/max(its,1):.1f} ms/it", flush=True)
    model._cur_lam_adj = lam  # warm start for rep 1, as in the outer loop

t = time.perf_counter()
s2, nit, nrm, conv = model._ns_solve(X, s, verbose=True)
jax.block_until_ready(s2)
print(f"FORWARD re-solve (warm start): {time.perf_counter()-t:.1f}s, "
      f"{int(nit)} newton, |R|={float(nrm):.3e}, conv={bool(conv)}",
      flush=True)
