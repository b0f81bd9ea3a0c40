"""Flagship benchmark scenes built programmatically.

`cornell()` is the killeroo-class benchmark stand-in used by bench.py and
the graft entry: area light + matte/plastic/mirror/glass materials, a few
thousand triangles (subdivided spheres), NEE + MIS path tracing — matching
BASELINE config #2 ("Cornell-box-style scene, area lights + glass/mirror
BSDFs, NEE + MIS").  `killeroo()` loads the reference's in-repo scene when
available (BASELINE config #1).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.scene.ir import (SceneBuilder, MaterialSpec, MAT_MATTE,
                               MAT_MIRROR, MAT_GLASS, MAT_PLASTIC)
from pbrt_tpu.cameras import projective

KILLEROO_SCENE = "/root/reference/scenes/killeroo-simple.pbrt"


def _rgb(r, g, b, kind="reflectance"):
    return spec.from_rgb_np(np.asarray([r, g, b], np.float64), kind)


def _uv_sphere(n_theta=24, n_phi=48):
    th = np.linspace(1e-3, np.pi - 1e-3, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, Ph = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack([np.sin(T) * np.cos(Ph), np.sin(T) * np.sin(Ph),
                    np.cos(T)], -1).reshape(-1, 3)
    idx = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = a + n_phi
            d = b + n_phi
            idx += [[a, b, d], [a, d, c]]
    return pts, np.asarray(idx)


def cornell(tessellate=True):
    """Returns (scene, camera_ctor) — camera_ctor(W, H) -> camera."""
    b = SceneBuilder()
    white = b.add_material(MaterialSpec(type=MAT_MATTE,
                                        kd=_rgb(.73, .73, .73), name="white"))
    red = b.add_material(MaterialSpec(type=MAT_MATTE,
                                      kd=_rgb(.65, .05, .05), name="red"))
    green = b.add_material(MaterialSpec(type=MAT_MATTE,
                                        kd=_rgb(.12, .45, .15), name="green"))
    mirror = b.add_material(MaterialSpec(type=MAT_MIRROR,
                                         kr=np.full(31, .9, np.float32),
                                         name="mirror"))
    glass = b.add_material(MaterialSpec(type=MAT_GLASS,
                                        kr=np.ones(31, np.float32),
                                        kt=np.ones(31, np.float32),
                                        eta=1.5, name="glass"))
    plastic = b.add_material(MaterialSpec(type=MAT_PLASTIC,
                                          kd=_rgb(.3, .35, .5),
                                          ks=np.full(31, .4, np.float32),
                                          rough_u=0.05, rough_v=0.05,
                                          name="plastic"))
    blackm = b.add_material(MaterialSpec(type=MAT_MATTE, name="black"))

    def quad(pts, mat, light=-1):
        b.add_triangle_mesh(pts, [[0, 1, 2], [2, 3, 0]], mat, light_id=light)

    quad([[0, 0, 0], [5, 0, 0], [5, 5, 0], [0, 5, 0]], white)
    quad([[0, 0, 5], [0, 5, 5], [5, 5, 5], [5, 0, 5]], white)
    quad([[0, 0, 0], [0, 5, 0], [0, 5, 5], [0, 0, 5]], red)
    quad([[5, 0, 0], [5, 0, 5], [5, 5, 5], [5, 5, 0]], green)
    quad([[0, 5, 0], [5, 5, 0], [5, 5, 5], [0, 5, 5]], white)
    li = b.add_area_light(
        spec.from_rgb_np(np.asarray([1.0, 0.85, 0.6]), "illuminant") * 15.0)
    quad([[1.8, 1.8, 4.99], [1.8, 3.2, 4.99], [3.2, 3.2, 4.99],
          [3.2, 1.8, 4.99]], blackm, light=li)

    if tessellate:
        # triangulated spheres raise prim count to killeroo-class (~10k)
        pts, idx = _uv_sphere(28, 56)
        b.add_triangle_mesh(pts * 1.0 + np.array([3.5, 3.4, 1.0]), idx, mirror)
        b.add_triangle_mesh(pts * 0.8 + np.array([1.4, 2.6, 0.8]), idx, plastic)
        b.add_sphere(tfm.translate(2.5, 1.3, 0.6) * tfm.scale(.6, .6, .6),
                     1.0, glass)
    else:
        b.add_sphere(tfm.translate(3.5, 3.4, 1.0), 1.0, mirror)
        b.add_sphere(tfm.translate(1.4, 2.6, 0.8) * tfm.scale(.8, .8, .8),
                     1.0, plastic)

    scene = b.build()

    def camera_ctor(W, H):
        return projective.make_perspective(
            tfm.look_at([2.5, -4.5, 2.5], [2.5, 2.5, 2.5], [0, 0, 1]),
            50.0, W, H)

    return scene, camera_ctor


def killeroo():
    """Parse the reference's killeroo-simple scene (BASELINE config #1)."""
    from pbrt_tpu.parser.api import parse_scene
    job = parse_scene(KILLEROO_SCENE)
    from pbrt_tpu.tools.pbrt import build_camera

    def camera_ctor(W, H):
        return build_camera(job, W, H)

    return job, camera_ctor
