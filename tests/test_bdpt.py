"""BDPT (s,t)-MIS integrator tests (reference: src/integrators/bdpt.cpp).

Validates strategy-family closure: the weighted sum over all (s,t)
strategies must reproduce the path-tracer estimate on scenes where both
cover the same transport.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
from pbrt_tpu.scene import ir
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.cameras import projective
from pbrt_tpu.film import film as filmmod
from pbrt_tpu.integrators import path as pathint, bdpt
from pbrt_tpu.samplers.samplers import SamplerConfig


def _box(light="point", mirror=False):
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(kd=np.full(31, 0.6, np.float32)))
    s = 2.0
    for p0, p1, p2, p3 in [
            ([-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s]),
            ([-s, -s, -s], [-s, -s, s], [-s, s, s], [-s, s, -s]),
            ([s, -s, -s], [s, s, -s], [s, s, s], [s, -s, s]),
            ([-s, -s, -s], [s, -s, -s], [s, -s, s], [-s, -s, s]),
            ([-s, s, -s], [-s, s, s], [s, s, s], [s, s, -s])]:
        b.add_triangle_mesh([p0, p1, p2, p3], [[0, 1, 2], [2, 3, 0]], m)
    if mirror:
        mir = b.add_material(MaterialSpec(type=ir.MAT_MIRROR,
                                          kr=np.full(31, 0.9, np.float32)))
        b.add_sphere(tfm.translate(0.7, -1.2, 0.7), 0.8, mir)
    if light == "point":
        b.add_point_light([0, 1.0, -0.5], np.full(31, 8.0, np.float32))
    else:
        lid = b.add_area_light(np.full(31, 6.0, np.float32))
        b.add_triangle_mesh(
            [[-0.5, 1.9, -0.5], [0.5, 1.9, -0.5],
             [0.5, 1.9, 0.5], [-0.5, 1.9, 0.5]],
            [[0, 1, 2], [2, 3, 0]], m, light_id=lid)   # faces down
    return b.build()


def _compare(scene, md, spp_p=96, spp_b=48, tol=0.06):
    cam = projective.make_perspective(
        tfm.look_at([0, 0, -1.9], [0, 0, 1], [0, 1, 0]), 40.0, 12, 12)
    cfg = SamplerConfig("sobol", 0, 256)
    fp = pathint.render(scene, cam, filmmod.make_film(12, 12), cfg,
                        spp=spp_p, max_depth=md)
    mp = float(np.asarray(filmmod.develop_spectral(fp)).mean())
    fb, scale = bdpt.render_bdpt(scene, cam, filmmod.make_film(12, 12),
                                 cfg, spp=spp_b, max_depth=md)
    mb = float(np.asarray(filmmod.develop_spectral(
        fb.replace(splat=fb.splat * scale))).mean())
    assert abs(mb / mp - 1.0) < tol, (mp, mb)
    return mp, mb


def test_bdpt_matches_path_point_light():
    _compare(_box("point"), md=2)


def test_bdpt_matches_path_area_light():
    _compare(_box("area"), md=2)
