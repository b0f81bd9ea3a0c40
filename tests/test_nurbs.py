"""NURBS / hyperboloid tessellation tests (reference: shapes/nurbs.cpp,
shapes/hyperboloid.cpp — both tessellate/solve parametric surfaces)."""
import numpy as np

from pbrt_tpu.shapes.nurbs import (_basis_functions, evaluate_nurbs,
                                   tessellate_nurbs,
                                   tessellate_hyperboloid)
from pbrt_tpu.parser.api import PbrtAPI


def test_basis_partition_of_unity():
    # cubic (order 4) clamped knot vector, 6 control points
    knots = [0, 0, 0, 0, 1, 2, 3, 3, 3, 3]
    u = np.linspace(0, 3, 50)
    B = _basis_functions(u, 4, knots)
    assert B.shape == (50, 6)
    assert np.allclose(B.sum(1), 1.0, atol=1e-9)
    assert (B >= -1e-12).all()


def test_linear_patch_is_plane():
    # order-2 (linear) 2x2 patch = bilinear quad in z=0
    knots = [0, 0, 1, 1]
    P = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    pts = evaluate_nurbs(np.linspace(0, 1, 7), np.linspace(0, 1, 5),
                         2, 2, 2, 2, knots, knots, np.concatenate(
                             [P.reshape(2, 2, 3),
                              np.ones((2, 2, 1))], -1))
    assert np.allclose(pts[..., 2], 0.0, atol=1e-9)
    assert np.allclose(pts[0, 0], [0, 0, 0], atol=1e-9)
    assert np.allclose(pts[-1, -1], [1, 1, 0], atol=1e-9)


def test_rational_quarter_circle():
    # classic NURBS exact quarter circle: order 3, weights (1, √2/2, 1)
    w = np.sqrt(2) / 2
    Pw = np.array([[1, 0, 0, 1], [w, w, 0, w], [0, 1, 0, 1]], float)
    knots = [0, 0, 0, 1, 1, 1]
    # degenerate v direction: single row (order 1, 1 cp)
    pts = evaluate_nurbs(np.linspace(0, 1, 33), np.array([0.0]),
                         3, 1, 3, 1, knots, [0, 1],
                         Pw.reshape(1, 3, 4))
    r = np.linalg.norm(pts[0, :, :2], axis=-1)
    assert np.allclose(r, 1.0, atol=1e-9)


def test_tessellate_grid_counts():
    knots = [0, 0, 1, 1]
    P = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], float)
    verts, tris, uvs = tessellate_nurbs(2, 2, 2, 2, knots, knots,
                                        0, 1, 0, 1, P=P)
    assert verts.shape[0] == uvs.shape[0]
    assert tris.min() == 0 and tris.max() == verts.shape[0] - 1


def test_hyperboloid_cylinder_limit():
    # sweeping a vertical segment at radius 1 -> unit cylinder
    verts, tris = tessellate_hyperboloid([1, 0, -1], [1, 0, 1],
                                         2 * np.pi)
    r = np.linalg.norm(verts[:, :2], axis=-1)
    assert np.allclose(r, 1.0, atol=1e-6)
    assert verts[:, 2].min() == -1 and verts[:, 2].max() == 1


def test_parser_nurbs_and_hyperboloid():
    job = PbrtAPI().parse_string("""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Shape "nurbs" "integer nu" [2] "integer nv" [2]
    "integer uorder" [2] "integer vorder" [2]
    "float uknots" [0 0 1 1] "float vknots" [0 0 1 1]
    "point P" [0 0 0  1 0 0  0 1 0  1 1 0]
Shape "hyperboloid" "point p1" [1 0 -1] "point p2" [1 0 1]
WorldEnd
""")
    s = job.scene
    assert s.tri_v0.shape[0] > 100  # both tessellated into real triangles
