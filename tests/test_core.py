"""Core layer tests: quadrature, geometry generation, refinement hierarchy."""
import numpy as np
import pytest

from admm_optim_tpu.core import geomgen
from admm_optim_tpu.core.mesh import Hierarchy, refine
from admm_optim_tpu.core.quadrature import simplex_rule


def _monomial_integral_tri(a, b):
    # int over unit triangle of x^a y^b = a! b! / (a+b+2)!
    import math

    return math.factorial(a) * math.factorial(b) / math.factorial(a + b + 2)


def _monomial_integral_tet(a, b, c):
    import math

    return (
        math.factorial(a)
        * math.factorial(b)
        * math.factorial(c)
        / math.factorial(a + b + c + 3)
    )


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_quadrature_tri_exact(degree):
    bary, w = simplex_rule(2, degree)
    pts = bary[:, 1:]
    vol = 0.5
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            val = vol * np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b)
            assert val == pytest.approx(_monomial_integral_tri(a, b), rel=1e-12)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5])
def test_quadrature_tet_exact(degree):
    bary, w = simplex_rule(3, degree)
    pts = bary[:, 1:]
    vol = 1.0 / 6.0
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            for c in range(degree + 1 - a - b):
                val = vol * np.sum(
                    w * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c
                )
                assert val == pytest.approx(
                    _monomial_integral_tet(a, b, c), rel=1e-11, abs=1e-15
                )


def _total_volume(lvl):
    # orientation is mixed by design (path-ordered Kuhn tets keep refinement
    # translation-invariant; assembly uses |detJ|) - measure is unsigned
    x = lvl.coords[lvl.elems]
    d = lvl.dim
    import math

    det = np.linalg.det(x[:, 1:] - x[:, :1])
    assert np.all(np.abs(det) > 1e-14), "degenerate element"
    return np.abs(det).sum() / math.factorial(d)


def test_channel2d_mesh():
    lvl = geomgen.channel_2d()
    assert lvl.dim == 2
    # area = 14*6 - 1 (unit obstacle removed)
    assert _total_volume(lvl) == pytest.approx(14 * 6 - 1.0)
    for name in ["outer", "wall", "obstacle_surface", "inlet", "outlet"]:
        assert name in lvl.subset_vertices
    assert lvl.subset_vertices["obstacle_surface"].sum() == 4
    assert lvl.subset_edges["obstacle_surface"].sum() == 4
    assert lvl.subset_vertices["inlet"].sum() == 6  # 2*(n_side_y+1) axis lines
    assert lvl.subset_elems["outer"].all()


def test_refine_2d_preserves_volume_and_subsets():
    lvl = geomgen.channel_2d()
    f = refine(lvl)
    assert f.num_elems == 4 * lvl.num_elems
    assert f.num_vertices == lvl.num_vertices + len(lvl.edges)
    assert _total_volume(f) == pytest.approx(_total_volume(lvl))
    # subset vertex counts: obstacle surface ring doubles its vertex count
    assert f.subset_vertices["obstacle_surface"].sum() == 8
    assert f.subset_edges["obstacle_surface"].sum() == 8
    # parents invariant: prolongation of coordinates reproduces fine coords
    xc = lvl.coords
    xf = 0.5 * (xc[f.parents[:, 0]] + xc[f.parents[:, 1]])
    np.testing.assert_allclose(xf, f.coords, atol=1e-14)


def test_channel3d_mesh_and_refine():
    lvl = geomgen.channel_3d()
    assert lvl.dim == 3
    assert _total_volume(lvl) == pytest.approx(20 * 6 * 6 - 1.0)
    assert lvl.subset_vertices["obstacle_surface"].sum() == 8
    f = refine(lvl)
    assert f.num_elems == 8 * lvl.num_elems
    assert _total_volume(f) == pytest.approx(_total_volume(lvl))
    # obstacle cube surface after refinement: 8 corners + 12 edge midpoints +
    # 6 face centers = 26 vertices
    assert f.subset_vertices["obstacle_surface"].sum() == 26
    xc = lvl.coords
    xf = 0.5 * (xc[f.parents[:, 0]] + xc[f.parents[:, 1]])
    np.testing.assert_allclose(xf, f.coords, atol=1e-14)


def test_hierarchy_from_generator():
    h = Hierarchy([geomgen.channel_2d()])
    for _ in range(2):
        h.levels.append(refine(h.levels[-1]))
    assert len(h.levels) == 3
    assert h.fine.num_elems == 16 * h.levels[0].num_elems
