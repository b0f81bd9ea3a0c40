"""Per-primitive MediumInterface tests (reference: api.cpp
pbrtMediumInterface + MediumInterface nesting on GeometricPrimitive)."""
import numpy as np
import pytest

from pbrt_tpu.parser.api import PbrtAPI
from pbrt_tpu.tools.pbrt import run_job
from pbrt_tpu.film import film as filmmod

BASE = """
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [24]
Integrator "volpath" "integer maxdepth" [6]
WorldBegin
%s
AttributeBegin
AreaLightSource "area" "color L" [12 12 12]
Translate 0 0 4
Shape "trianglemesh" "point P" [-3 -3 0  3 -3 0  3 3 0  -3 3 0]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
AttributeBegin
Material "glass"
%s
Shape "sphere" "float radius" [1]
AttributeEnd
WorldEnd
"""


def _render(med_decl, iface):
    job = PbrtAPI().parse_string(BASE % (med_decl, iface))
    film, _ = run_job(job, quiet=True, progress=False)
    return job, np.asarray(filmmod.develop_rgb(film))


def test_inside_medium_attenuates():
    ink = ('MakeNamedMedium "ink" "string type" "homogeneous" '
           '"color sigma_a" [3 3 3] "color sigma_s" [0 0 0]')
    job_i, img_i = _render(ink, 'MediumInterface "ink" ""')
    job_c, img_c = _render("", "")
    s = job_i.scene
    assert s.has_prim_media
    assert int(s.camera_medium) == -1
    pm = np.asarray(s.prim_medium_in)
    assert (pm >= 0).any()                     # sphere prims bound
    # the light plane itself has no medium binding
    assert (np.asarray(s.prim_medium_out) <= 0).all()
    # looking through the ink-filled glass sphere is darker than clear
    ci = img_i[9:15, 9:15].mean()
    cc = img_c[9:15, 9:15].mean()
    assert np.isfinite(img_i).all()
    assert ci < 0.6 * cc, (ci, cc)
    # pixels missing the sphere are unaffected (vacuum outside)
    edge_i = img_i[0:3, :].mean()
    edge_c = img_c[0:3, :].mean()
    assert abs(edge_i - edge_c) < 0.12 * max(edge_c, 1e-6), (edge_i,
                                                             edge_c)


def test_prim_media_global_medium_not_duplicated():
    """A MediumInterface-bound medium must not also become the global
    medium (which would fog the whole scene)."""
    from pbrt_tpu.integrators.volpath import build_medium_from_job
    from pbrt_tpu.media.media import MEDIUM_NONE
    ink = ('MakeNamedMedium "ink" "string type" "homogeneous" '
           '"color sigma_a" [3 3 3]')
    job = PbrtAPI().parse_string(BASE % (ink, 'MediumInterface "ink" ""'))
    assert "ink" in job.prim_media_names
    med = build_medium_from_job(job)
    assert med.kind == MEDIUM_NONE


MEDIA_SHADOW = """
LookAt 0 0.5 -5  0 -1 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [32]
Integrator "volpath" "integer maxdepth" [2]
WorldBegin
AttributeBegin
AreaLightSource "area" "color L" [20 20 20]
Shape "trianglemesh" "point P" [-1 3 -1  1 3 -1  1 3 1  -1 3 1]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
AttributeBegin
Material "matte" "color Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point P" [-3 -1 -3  3 -1 -3  3 -1 3  -3 -1 3]
    "integer indices" [0 2 1 0 3 2]
AttributeEnd
%s
WorldEnd
"""

SPHERE_IFACE = """
MakeNamedMedium "juice" "string type" "homogeneous"
    "color sigma_a" [2 2 2] "color sigma_s" [0 0 0]
AttributeBegin
Material ""
MediumInterface "juice" ""
Translate 0 1 0
Shape "sphere" "float radius" [0.8]
AttributeEnd
"""


def test_shadow_tr_walks_medium_boundaries():
    """VERDICT r3 item 5: shadow-ray Tr must attenuate only the
    sub-segment actually inside the bound medium (Scene::IntersectTr
    walk, scene.cpp:57-81), not apply the vertex's own medium to the
    whole segment.  A wall in vacuum shadow-traced through an
    absorbing-medium interface sphere must see exp(-sigma_t * chord)
    of the clear-scene direct light at the center, and full light
    where the shadow segment misses the sphere."""
    job_m, img_m = _render_shadow(SPHERE_IFACE)
    job_c, img_c = _render_shadow("")
    assert job_m.scene.has_prim_media
    # center pixel: shadow segment crosses the full diameter (chord
    # 1.6, sigma_t 2 -> exp(-3.2) ~ 0.041); old behavior gave 1.0
    c_m = img_m[10:14, 10:14].mean()
    c_c = img_c[10:14, 10:14].mean()
    ratio = c_m / max(c_c, 1e-9)
    assert 0.01 < ratio < 0.25, (c_m, c_c, ratio)
    # corners: segment misses the sphere entirely -> unattenuated
    corner_m = img_m[19:22, 10:14].mean()
    corner_c = img_c[19:22, 10:14].mean()
    assert abs(corner_m - corner_c) < 0.1 * max(corner_c, 1e-6)


def _render_shadow(iface_block):
    job = PbrtAPI().parse_string(MEDIA_SHADOW % iface_block)
    film, _ = run_job(job, quiet=True, progress=False)
    return job, np.asarray(filmmod.develop_rgb(film))
