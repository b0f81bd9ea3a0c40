"""Curve shape tests (reference: src/shapes/curve.cpp)."""
import numpy as np

from pbrt_tpu.shapes import curve
from pbrt_tpu.parser.api import PbrtAPI


def test_bezier_eval_endpoints():
    cp = np.array([[0, 0, 0], [1, 0, 0], [2, 1, 0], [3, 1, 1]], float)
    p = curve.bezier_eval(cp, np.array([0.0, 1.0]))
    assert np.allclose(p[0], cp[0]) and np.allclose(p[1], cp[3])
    mid = curve.bezier_eval(cp, np.array([0.5]))[0]
    assert np.allclose(mid, (cp[0] + 3 * cp[1] + 3 * cp[2] + cp[3]) / 8)


def test_ribbon_tessellation_width():
    cp = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], float)
    v, i, uv = curve.tessellate_curve(cp, 0.2, 0.4, "flat", n_segments=4)
    assert uv.shape == (10, 2)
    assert set(np.unique(uv[:, 1])) == {0.0, 1.0}  # v across width
    assert len(v) == 10 and len(i) == 8
    # ribbon width at the start/end matches width0/width1
    w_start = np.linalg.norm(v[5] - v[0])
    w_end = np.linalg.norm(v[9] - v[4])
    assert np.isclose(w_start, 0.2, atol=1e-6)
    assert np.isclose(w_end, 0.4, atol=1e-6)


def test_cylinder_tube():
    cp = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3]], float)
    v, i, uv = curve.tessellate_curve(cp, 0.1, 0.1, "cylinder",
                                      n_segments=4, n_sides=6)
    assert uv.shape == (30, 2)
    assert len(v) == 30 and len(i) == 48
    r = np.linalg.norm(v[:6, :2], axis=-1)
    assert np.allclose(r, 0.05, atol=1e-6)


def test_bspline_segments():
    P = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0],
                  [4, 0, 0]], float)
    v, i, uv = curve.curve_from_params(P, basis="bspline", width0=0.1,
                                       width1=0.1)
    assert uv[:, 0].min() == 0.0 and uv[:, 0].max() == 1.0
    assert len(v) > 0 and len(i) > 0  # 2 sliding-window segments


def test_curve_directive_parses_and_renders():
    job = PbrtAPI().parse_string("""
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "sobol" "integer pixelsamples" [2]
Integrator "path" "integer maxdepth" [1]
WorldBegin
LightSource "distant" "color L" [3 3 3] "point from" [0 0 -1] "point to" [0 0 0]
Material "matte" "color Kd" [.7 .4 .2]
Shape "curve" "string type" "cylinder"
  "point P" [-1 -0.5 0  -0.3 0.5 0  0.3 -0.5 0  1 0.5 0]
  "float width0" [0.3] "float width1" [0.2]
WorldEnd
""")
    assert job.scene.n_prims > 16  # tessellated tube triangles
    from pbrt_tpu.tools.pbrt import run_job
    from pbrt_tpu.film import film as filmmod
    film, _ = run_job(job, quiet=True, progress=False)
    img = np.asarray(filmmod.develop_spectral(film))
    assert img.max() > 0.01 and np.isfinite(img).all()
