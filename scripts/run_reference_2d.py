"""Long-run trajectory validation on the reference's own 2D grid
(grids/refined.ugx): the optimization must sustain monotone drag descent
over many accepted steps, mirroring the reference driver's own success
criterion (2d_admm.lua:1300-1306, __Drag.txt telemetry 2d_admm.lua:1349).

CPU (f64) or TPU (f32 presets); writes the __Drag.txt-family telemetry to
--outDir.  Usage:
    python scripts/run_reference_2d.py [num_steps] [num_refs] [visc] [outdir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ON_CPU = os.environ.get("REF2D_TPU", "") != "1"

import jax

if ON_CPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_admm"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
REFS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
VISC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
OUT = sys.argv[4] if len(sys.argv) > 4 else "/tmp/ref2d_out"
# reference-default configuration (2d_admm.lua:43-58): admmSteps=1000,
# tau=1.0 - overridable so the short r1 fixture configs stay reproducible
ADMM_STEPS = int(sys.argv[5]) if len(sys.argv) > 5 else 40
TAU = float(sys.argv[6]) if len(sys.argv) > 6 else 2.0
GRID = os.environ.get(
    "REF2D_GRID", "/root/reference/grids/refined.ugx"
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

cfg = ProblemConfig(
    dim=2, num_refs=REFS, grid_path=GRID, visc=VISC, backend="global",
    admm=admm.ADMMConfig(admm_steps=ADMM_STEPS, ns_max_its=8, tau=TAU,
                         lin_max_iters=120),
)
if not ON_CPU:
    cfg = f32_presets(cfg)
tw = TelemetryWriter(OUT)
ckpt = os.path.join(OUT, "checkpoint.npz")
# REF2D_RESUME=1: pick up an existing checkpoint from a previous process
resume0 = (
    load_checkpoint(ckpt)
    if os.environ.get("REF2D_RESUME") == "1" and os.path.exists(ckpt)
    else None
)
t0 = time.perf_counter()
hist = resumable_run(
    lambda: ObstacleShapeOpt(cfg), ckpt, max_restarts=20, resume=resume0,
    num_steps=STEPS, verbose=True, telemetry=tw,
)
wall = time.perf_counter() - t0

drags = np.array([r.drag for r in hist])
print(f"steps accepted: {len(hist)}/{STEPS} wall {wall:.0f}s")
print(f"drag: {drags[0]:.6f} -> {drags[-1]:.6f} "
      f"({100 * (1 - drags[-1] / drags[0]):.2f}% reduction)")
mono = bool(np.all(np.diff(drags) < 0))
print(f"monotone descent: {mono}")
assert len(hist) >= min(STEPS, 10) and mono
print("OK")
