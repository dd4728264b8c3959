"""Ingestion + short-trajectory runs on the reference's own grids.

SURVEY.md section 7 ("minimum end-to-end slice" / hard part 6): the
framework must consume the upstream `.ugx` meshes unmodified.  The grids
are read in place from the read-only reference mount (never vendored);
everything here skips when that mount is absent.

Structure facts asserted below come from SURVEY.md section 0's table
(refined.ugx: 160 verts / 276 tris; box_3D_elongated.ugx: 338 verts /
1216 tets; subsets outer/wall/obstacle_surface/inlet/outlet).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from admm_optim_tpu.core.mesh import Hierarchy
from admm_optim_tpu.core.ugx import read_ugx

SUBSETS = {"outer", "wall", "obstacle_surface", "inlet", "outlet"}


def test_load_2d_reference_grid(grid2d_path):
    g = read_ugx(grid2d_path)
    assert g.dim == 2
    assert g.coords.shape[0] == 160
    assert g.triangles.shape[0] == 276
    assert SUBSETS <= set(g.subsets)


def test_load_3d_reference_grid(grid3d_path):
    g = read_ugx(grid3d_path)
    assert g.dim == 3
    assert g.coords.shape[0] == 338
    assert g.tetrahedrons.shape[0] == 1216
    assert SUBSETS <= set(g.subsets)


def test_refine_2d_reference_grid(grid2d_path):
    hier = Hierarchy.from_ugx(grid2d_path, 1)
    f, c = hier.fine, hier.levels[0]
    assert f.num_elems == 4 * c.num_elems
    # red refinement: V_fine = V + #edges
    assert f.num_vertices == c.num_vertices + len(c.edges)
    # boundary subsets survive refinement
    for s in SUBSETS - {"outer"}:
        assert f.subset_vertices[s].sum() > c.subset_vertices[s].sum()


def test_refine_3d_reference_grid(grid3d_path):
    hier = Hierarchy.from_ugx(grid3d_path, 1)
    f, c = hier.fine, hier.levels[0]
    assert f.num_elems == 8 * c.num_elems
    assert f.num_vertices == c.num_vertices + len(c.edges)


@pytest.mark.slow
def test_2d_reference_grid_short_trajectory(grid2d_path):
    """Two optimization steps of the full pipeline on refined.ugx: drag must
    strictly decrease over accepted steps (the reference's own success
    criterion, 2d_admm.lua:1300-1306)."""
    from admm_optim_tpu.models.obstacle import ObstacleShapeOpt, ProblemConfig
    from admm_optim_tpu.optim import admm

    cfg = ProblemConfig(
        dim=2,
        num_refs=1,
        grid_path=grid2d_path,
        visc=0.05,
        backend="global",
        admm=admm.ADMMConfig(admm_steps=40, ns_max_its=8, tau=2.0,
                             lin_max_iters=120),
    )
    model = ObstacleShapeOpt(cfg)
    hist = model.run(num_steps=2)
    assert len(hist) == 2
    drags = [r.drag for r in hist]
    assert drags[1] < drags[0]
    assert all(np.isfinite(d) for d in drags)
