"""Short trajectory on the reference's own 3D grid
(grids/box_3D_elongated.ugx): accepted steps with decreasing drag,
4 geometric constraints (vol + 3 barycenter), Frobenius-only projection -
the 3d_admm.lua configuration (SURVEY.md section 2a #2).

Usage: python scripts/run_reference_3d.py [num_steps] [num_refs] [visc] [outdir]
(CPU f64 by default; REF3D_TPU=1 for the f32 TPU presets.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ON_CPU = os.environ.get("REF3D_TPU", "") != "1"

import jax

if ON_CPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
OUT = sys.argv[4] if len(sys.argv) > 4 else "/tmp/ref3d_out"
GRID = os.environ.get(
    "REF3D_GRID", "/root/reference/grids/box_3D_elongated.ugx"
)

from admm_optim_tpu.io.checkpoint import load_checkpoint
from admm_optim_tpu.io.resume import resumable_run
from admm_optim_tpu.io.telemetry import TelemetryWriter
from admm_optim_tpu.models.obstacle import (
    ObstacleShapeOpt,
    ProblemConfig,
    f32_presets,
)
from admm_optim_tpu.optim import admm
from admm_optim_tpu.utils.profiling import Profiler

cfg = ProblemConfig(
    dim=3, num_refs=REFS, grid_path=GRID, visc=VISC, backend="global",
    admm=admm.ADMMConfig(admm_steps=40, ns_max_its=8, tau=2.0,
                         lin_max_iters=250),
)
if not ON_CPU:
    cfg = f32_presets(cfg)
tw = TelemetryWriter(OUT)
ckpt = os.path.join(OUT, "checkpoint.npz")
# REF3D_RESUME=1: pick up an existing checkpoint from a previous process
resume0 = (
    load_checkpoint(ckpt)
    if os.environ.get("REF3D_RESUME") == "1" and os.path.exists(ckpt)
    else None
)
prof = Profiler() if os.environ.get("REF3D_PROFILE") == "1" else None
t0 = time.perf_counter()
hist = resumable_run(
    lambda: ObstacleShapeOpt(cfg), ckpt, max_restarts=20, resume=resume0,
    num_steps=STEPS, verbose=True, telemetry=tw, profiler=prof,
)
wall = time.perf_counter() - t0
if prof is not None:
    print(prof.report())

drags = np.array([r.drag for r in hist])
print(f"steps accepted: {len(hist)}/{STEPS} wall {wall:.0f}s")
print(f"drag: {drags[0]:.6f} -> {drags[-1]:.6f}")
mono = bool(np.all(np.diff(drags) < 0))
print(f"monotone descent: {mono}")
assert len(hist) >= 1 and mono
print("OK")
