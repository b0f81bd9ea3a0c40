"""Projective cameras: perspective, orthographic, environment.

Reference: src/cameras/{perspective,orthographic,environment}.cpp +
src/core/camera.{h,cpp}.  Ray generation is a closed-form batched kernel;
the raster->camera chain is precomputed host-side exactly like the
reference's ProjectiveCamera constructor (camera.h:86+):

    raster -> NDC -> screen -> camera  (then camera->world)

Depth of field via thin-lens sampling matches perspective.cpp:69-130.
Per-ray wavelength tags are attached by the integrator (fork field).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from pbrt_tpu.core import geometry as geom
from pbrt_tpu.core import sampling
from pbrt_tpu.core import transform as tfm


@struct.dataclass
class ProjectiveCamera:
    cam_to_world: jnp.ndarray      # [4,4]
    raster_to_camera: jnp.ndarray  # [4,4]
    camera_to_raster: jnp.ndarray  # [4,4]
    lens_radius: jnp.ndarray       # []
    focal_distance: jnp.ndarray    # []
    shutter_open: jnp.ndarray      # []
    shutter_close: jnp.ndarray     # []
    kind: str = struct.field(pytree_node=False, default="perspective")
    # physical-area factor for importance (We); filled for perspective
    lens_area: jnp.ndarray = None
    # camera motion blur: decomposed two-keyframe cam_to_world
    # (transform.py animated_pair); None => static camera
    anim_t: jnp.ndarray = None     # [2,3]
    anim_q: jnp.ndarray = None     # [2,4]
    anim_s: jnp.ndarray = None     # [2,3,3]


def _screen_window(width, height, screen=None):
    aspect = width / height
    if screen is not None:
        return screen
    if aspect > 1:
        return (-aspect, aspect, -1.0, 1.0)
    return (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)


def _raster_to_screen(width, height, screen):
    x0, x1, y0, y1 = screen
    st = (tfm.scale(width, height, 1.0)
          * tfm.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
          * tfm.translate(-x0, -y1, 0.0))
    return st.inverse()


def make_perspective(cam_to_world: tfm.Transform, fov_deg, width, height,
                     lens_radius=0.0, focal_distance=1e6, screen=None,
                     shutter_open=0.0, shutter_close=1.0,
                     cam_to_world1: tfm.Transform = None):
    screen = _screen_window(width, height, screen)
    cam_to_screen = tfm.perspective(fov_deg, 1e-2, 1000.0)
    raster_to_screen = _raster_to_screen(width, height, screen)
    raster_to_camera = cam_to_screen.inverse() * raster_to_screen
    anim = {}
    if cam_to_world1 is not None and             not np.allclose(cam_to_world1.m, cam_to_world.m):
        at, aq, asq = tfm.animated_pair(cam_to_world.m, cam_to_world1.m)
        anim = dict(anim_t=jnp.asarray(at), anim_q=jnp.asarray(aq),
                    anim_s=jnp.asarray(asq))
    return ProjectiveCamera(
        cam_to_world=jnp.asarray(cam_to_world.m, jnp.float32),
        raster_to_camera=jnp.asarray(raster_to_camera.m, jnp.float32),
        camera_to_raster=jnp.asarray(raster_to_camera.m_inv, jnp.float32),
        lens_radius=jnp.float32(lens_radius),
        focal_distance=jnp.float32(focal_distance),
        shutter_open=jnp.float32(shutter_open),
        shutter_close=jnp.float32(shutter_close),
        kind="perspective",
        lens_area=jnp.float32(max(np.pi * lens_radius ** 2, 1.0)),
        **anim)


def make_orthographic(cam_to_world: tfm.Transform, width, height,
                      lens_radius=0.0, focal_distance=1e6, screen=None,
                      shutter_open=0.0, shutter_close=1.0):
    screen = _screen_window(width, height, screen)
    cam_to_screen = tfm.orthographic(0.0, 1.0)
    raster_to_screen = _raster_to_screen(width, height, screen)
    raster_to_camera = cam_to_screen.inverse() * raster_to_screen
    return ProjectiveCamera(
        cam_to_world=jnp.asarray(cam_to_world.m, jnp.float32),
        raster_to_camera=jnp.asarray(raster_to_camera.m, jnp.float32),
        camera_to_raster=jnp.asarray(raster_to_camera.m_inv, jnp.float32),
        lens_radius=jnp.float32(lens_radius),
        focal_distance=jnp.float32(focal_distance),
        shutter_open=jnp.float32(shutter_open),
        shutter_close=jnp.float32(shutter_close),
        kind="orthographic", lens_area=jnp.float32(1.0))


def make_environment(cam_to_world: tfm.Transform, width, height,
                     shutter_open=0.0, shutter_close=1.0):
    return ProjectiveCamera(
        cam_to_world=jnp.asarray(cam_to_world.m, jnp.float32),
        raster_to_camera=jnp.eye(4, dtype=jnp.float32),
        camera_to_raster=jnp.eye(4, dtype=jnp.float32),
        lens_radius=jnp.float32(0.0), focal_distance=jnp.float32(1e6),
        shutter_open=jnp.float32(shutter_open),
        shutter_close=jnp.float32(shutter_close),
        kind="environment", lens_area=jnp.float32(1.0))


def generate_rays(camera: ProjectiveCamera, pfilm, u_lens, u_time=None,
                  width=None, height=None, wavelength=None):
    """pfilm [B,2] raster coords, u_lens [B,2] -> (Ray world, weight [B]).

    reference: PerspectiveCamera::GenerateRay (perspective.cpp:69).
    """
    B = pfilm.shape[0]
    pras = jnp.concatenate([pfilm, jnp.zeros((B, 1))], -1)
    if camera.kind == "environment":
        # equirect (environment.cpp): theta over height, phi over width
        theta = jnp.pi * pfilm[:, 1] / height
        phi = 2 * jnp.pi * pfilm[:, 0] / width
        d = jnp.stack([jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
                       jnp.sin(theta) * jnp.sin(phi)], -1)
        o = jnp.zeros((B, 3))
    else:
        pcam = tfm.xform_point(camera.raster_to_camera, pras)
        if camera.kind == "perspective":
            o = jnp.zeros((B, 3))
            d = geom.normalize(pcam)
        else:
            o = pcam
            d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (B, 3))
        # depth of field (perspective.cpp:114-127)
        def dof(o, d):
            lens = camera.lens_radius * sampling.concentric_sample_disk(
                u_lens[:, 0], u_lens[:, 1])
            ft = camera.focal_distance / jnp.maximum(d[:, 2], 1e-9)
            pfocus = o + ft[:, None] * d
            o2 = jnp.concatenate([lens, jnp.zeros((B, 1))], -1)
            d2 = geom.normalize(pfocus - o2)
            return o2, d2
        use_dof = camera.lens_radius > 0
        o_dof, d_dof = dof(o, d)
        o = jnp.where(use_dof, o_dof, o)
        d = jnp.where(use_dof, d_dof, d)
    if u_time is None:
        time = jnp.broadcast_to(camera.shutter_open, (B,))
    else:
        time = camera.shutter_open + u_time * (camera.shutter_close
                                               - camera.shutter_open)
    if camera.anim_t is not None:
        # camera motion blur: per-ray slerped cam_to_world at ray time
        # (reference: AnimatedTransform::Interpolate, transform.cpp:255+)
        m34 = tfm.interp_matrix_j(camera.anim_t, camera.anim_q,
                                  camera.anim_s, time)
        wo = jnp.einsum("bij,bj->bi", m34[..., :3], o) + m34[..., 3]
        wd = geom.normalize(jnp.einsum("bij,bj->bi", m34[..., :3], d))
    else:
        wo = tfm.xform_point(camera.cam_to_world, o)
        wd = geom.normalize(tfm.xform_vector(camera.cam_to_world, d))
    wl = None if wavelength is None else jnp.broadcast_to(
        jnp.asarray(wavelength, jnp.float32), (B,))
    return geom.Ray.make(wo, wd, wavelength=wl, time=time), jnp.ones(B)
