"""IO layer: telemetry files, VTU writer, checkpoint roundtrip, ugx
write/read roundtrip."""
import numpy as np

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, level_from_ugx
from admm_optim_tpu.core.ugx import UgxGrid, SubsetInfo, read_ugx, write_ugx
from admm_optim_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from admm_optim_tpu.io.telemetry import TelemetryWriter, write_columns
from admm_optim_tpu.io.vtk import write_vtu


def test_telemetry_files(tmp_path):
    t = TelemetryWriter(str(tmp_path))
    t.log_step({"step": 0, "drag": 1.0})
    t.write_drag([0, 1], [1.0, 0.9], [1.0, 0.9], [0.0, 0.1], [-0.1, -0.05])
    t.write_iterations([0, 1], [5, 6], [0.3, 0.3], [12, 14], [100, 120])
    t.close()
    drag = (tmp_path / "__Drag.txt").read_text().strip().splitlines()
    assert len(drag) == 2
    assert drag[0].split("\t")[0] == "0"
    hist = (tmp_path / "history.jsonl").read_text().strip().splitlines()
    assert len(hist) == 1


def test_newton_telemetry_files(tmp_path):
    # __NewtonStats/__NewtonIterations column layout (2d_admm.lua:1256-1259):
    # rows carry [norm_sum, |du|, |DLambda|, |Lu|, rhs_its, vol_its, bx, by]
    t = TelemetryWriter(str(tmp_path))
    rows = [
        [0.0, 1e-3, 2e-3, 5e-3, 7, 3, 2, 2],
        [0.0, 1e-6, 2e-6, 5e-6, 5, 2, 2, 2],
    ]
    t.write_newton_stats(3, rows)
    t.write_newton_iterations(3, rows)
    t.close()
    stats = (tmp_path / "__NewtonStats_step_3_.txt").read_text().strip().splitlines()
    assert len(stats) == 2
    # [step, norm_sum, du, dlam, lu]
    assert stats[0].split("\t") == ["1", "0.0", "0.001", "0.002", "0.005"]
    its = (tmp_path / "__NewtonIterations_step_3_.txt").read_text().strip().splitlines()
    # [step, rhs, vol, bx, by, large(=0, solve eliminated algebraically)]
    assert its[0].split("\t") == ["1", "7", "3", "2", "2", "0"]
    assert its[1].split("\t") == ["2", "5", "2", "2", "2", "0"]


def test_vtu_writer(tmp_path):
    lvl = geomgen.channel_2d()
    path = str(tmp_path / "mesh.vtu")
    write_vtu(path, lvl.coords, lvl.elems, point_data={"u": np.zeros_like(lvl.coords)})
    txt = open(path).read()
    assert "UnstructuredGrid" in txt
    assert f'NumberOfPoints="{lvl.num_vertices}"' in txt
    assert f'NumberOfCells="{lvl.num_elems}"' in txt


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck.npz")
    X = np.random.default_rng(0).normal(size=(10, 2))
    s = np.random.default_rng(1).normal(size=(37,))
    save_checkpoint(path, step=7, X=X, s=s, sigma=0.15, drag_old=0.83)
    z = load_checkpoint(path)
    assert z["step"] == 7
    np.testing.assert_allclose(z["X"], X)
    np.testing.assert_allclose(z["s"], s)
    assert z["sigma"] == 0.15


def test_ugx_roundtrip(tmp_path):
    lvl = geomgen.channel_2d()
    # build a UgxGrid from the level and round-trip it
    coords3 = np.pad(lvl.coords, ((0, 0), (0, 1)))
    subsets = {}
    for name in lvl.subset_vertices:
        subsets[name] = SubsetInfo(
            name=name,
            vertices=np.where(lvl.subset_vertices[name])[0].astype(np.int32),
            edges=np.where(lvl.subset_edges[name])[0].astype(np.int32),
            faces=np.where(lvl.subset_elems[name])[0].astype(np.int32),
            volumes=np.zeros(0, np.int32),
        )
    g = UgxGrid(
        name="t",
        coords=coords3,
        edges=lvl.edges,
        triangles=lvl.elems,
        tetrahedrons=np.zeros((0, 4), np.int32),
        subsets=subsets,
    )
    path = str(tmp_path / "g.ugx")
    write_ugx(path, g)
    g2 = read_ugx(path)
    np.testing.assert_allclose(g2.coords, coords3)
    np.testing.assert_array_equal(g2.triangles, lvl.elems)
    lvl2 = level_from_ugx(g2)
    assert lvl2.num_vertices == lvl.num_vertices
    for name in lvl.subset_vertices:
        np.testing.assert_array_equal(
            lvl2.subset_vertices[name], lvl.subset_vertices[name]
        )


def test_iterations_per_solver_columns(tmp_path):
    """__Iterations_per_step.txt per-solver columns: 2D layout has 10 columns
    (2d_admm.lua:1383-1384), 3D has 9 (3d_admm.lua:1416-1417); the Large
    column (eliminated solve) is 0."""
    t = TelemetryWriter(str(tmp_path))
    t.write_iterations(
        [0, 1], [5, 6], [0.3, 0.15], [12, 14], [100, 120],
        solver_iters=[(40, 20, 20, 20), (48, 24, 24, 24)], dim=2,
    )
    rows = (tmp_path / "__Iterations_per_step.txt").read_text().strip().splitlines()
    assert rows[0].split("\t") == [
        "0", "5", "0.3", "12", "100", "40", "20", "20", "20", "0"
    ]
    t3 = TelemetryWriter(str(tmp_path / "d3"))
    t3.write_iterations(
        [0], [2], [0.3], [7], [50],
        solver_iters=[(10, 10, 10, 10, 10)], dim=3,
    )
    rows3 = (tmp_path / "d3" / "__Iterations_per_step.txt").read_text().strip().splitlines()
    assert rows3[0].split("\t") == [
        "0", "7", "50", "10", "10", "10", "10", "10", "0"
    ]
    t.close()
    t3.close()
