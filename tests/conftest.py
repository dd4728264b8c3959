"""Test configuration: run everything on CPU with 8 virtual devices and f64.

This mirrors the SURVEY.md section 4 strategy: multi-device behavior is
tested on a virtual CPU mesh (the TPU analogue of testing MPI code without a
cluster), and FE correctness is checked in double precision.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

# the environment may have force-registered an accelerator platform via
# sitecustomize before this file runs; switch back to CPU explicitly.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
# the upstream grids are read in place when present (never vendored into
# this repo); tests depending on them skip when the mount is absent
REF_GRIDS = pathlib.Path("/root/reference/grids")
GRID_2D = str(REF_GRIDS / "refined.ugx")
GRID_3D = str(REF_GRIDS / "box_3D_elongated.ugx")


def _grid_or_skip(path):
    if not pathlib.Path(path).exists():
        pytest.skip(f"reference grid not available: {path}")
    return path


@pytest.fixture(scope="session")
def grid2d_path():
    return _grid_or_skip(GRID_2D)


@pytest.fixture(scope="session")
def grid3d_path():
    return _grid_or_skip(GRID_3D)
