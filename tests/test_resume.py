"""Fault-tolerant resume: a run killed after k accepted steps and resumed
from its checkpoint produces ONE contiguous telemetry history (the
io.resume addition; SURVEY.md section 5 checkpoint/resume row)."""
import numpy as np
import pytest

from admm_optim_tpu.io.checkpoint import load_checkpoint
from admm_optim_tpu.io.resume import resumable_run
from admm_optim_tpu.io.telemetry import TelemetryWriter
from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
from admm_optim_tpu.optim import admm

pytestmark = pytest.mark.slow


def _cfg():
    return ProblemConfig(
        dim=2,
        num_refs=1,
        visc=0.05,
        sigma_threshold=0.3,
        admm=admm.ADMMConfig(
            admm_steps=40, ns_max_its=8, tau=2.0, lin_max_iters=120
        ),
    )


def test_killed_and_resumed_run_writes_contiguous_history(tmp_path):
    out = tmp_path / "run"
    ckpt = str(out / "checkpoint.npz")

    # phase 1: run 2 steps, checkpointing each accepted step ("the kill")
    tw = TelemetryWriter(str(out))
    prob = ObstacleShapeOpt(_cfg())
    h1 = prob.run(
        num_steps=2, telemetry=tw, checkpoint_path=ckpt, verbose=False
    )
    assert len(h1) == 2

    # phase 2: FRESH model (as after a process death / device fault),
    # resumed from the checkpoint, continues to step 4
    tw2 = TelemetryWriter(str(out))
    prob2 = ObstacleShapeOpt(_cfg())
    h2 = prob2.run(
        num_steps=4,
        telemetry=tw2,
        checkpoint_path=ckpt,
        resume=load_checkpoint(ckpt),
        verbose=False,
    )
    # full history returned: restored steps 0-1 + new steps 2-3
    assert [r.step for r in h2] == [0, 1, 2, 3]
    drags = [r.drag for r in h2]
    assert all(d2 < d1 for d1, d2 in zip(drags, drags[1:])), drags
    # restored rows match phase 1 exactly
    assert h2[0].drag == h1[0].drag and h2[1].drag == h1[1].drag

    # __Drag.txt is one contiguous 4-row file with monotone drag
    rows = (out / "__Drag.txt").read_text().strip().splitlines()
    assert len(rows) == 4
    assert [r.split("\t")[0] for r in rows] == ["0", "1", "2", "3"]
    file_drags = [float(r.split("\t")[1]) for r in rows]
    np.testing.assert_allclose(file_drags, drags, rtol=1e-12)
    # __Iterations_per_step.txt: 10 columns (2D layout), contiguous
    itrows = (
        (out / "__Iterations_per_step.txt").read_text().strip().splitlines()
    )
    assert len(itrows) == 4 and len(itrows[0].split("\t")) == 10


def test_resumable_run_retries_through_injected_fault(tmp_path):
    out = tmp_path / "run"
    ckpt = str(out / "checkpoint.npz")
    tw = TelemetryWriter(str(out))
    calls = {"n": 0}

    class FaultyModel:
        """Wraps the real model; dies with a fake device fault after the
        first accepted step of the first attempt."""

        def __init__(self):
            self.inner = ObstacleShapeOpt(_cfg())

        def run(self, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                cb = kw.pop("callback", None)

                def bomb(step, X, s, rec):
                    if cb:
                        cb(step, X, s, rec)
                    raise RuntimeError("fake tunnel fault")

                kw["callback"] = bomb
            return self.inner.run(**kw)

    hist = resumable_run(
        FaultyModel,
        ckpt,
        max_restarts=3,
        restart_delay_s=0.0,
        num_steps=3,
        telemetry=tw,
        verbose=False,
    )
    assert calls["n"] == 2  # one fault, one successful resume
    assert [r.step for r in hist] == [0, 1, 2]
    rows = (out / "__Drag.txt").read_text().strip().splitlines()
    assert len(rows) == 3
