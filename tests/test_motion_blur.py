"""Two-keyframe motion blur (reference: AnimatedTransform applied per
ray, transform.cpp:255+; TransformSet x2 parsed at api.cpp:137-166).

Covers: quadric-instance motion (TransformBegin..ActiveTransform pair on
a sphere) and camera motion (animated cam_to_world)."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.core import transform as tfm
from pbrt_tpu.core import spectrum as spec
from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec, MAT_MATTE
from pbrt_tpu.cameras import projective
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.film import film as filmmod


def _scene(x0, x1=None):
    """Matte sphere at x0 (optionally moving to x1) lit by an area light."""
    b = SceneBuilder()
    white = b.add_material(MaterialSpec(type=MAT_MATTE,
                                        kd=np.full(31, .7, np.float32)))
    blackm = b.add_material(MaterialSpec(type=MAT_MATTE))
    li = b.add_area_light(np.full(31, 20.0, np.float32))
    # wound so the normal faces DOWN (-z): one-sided emitter toward scene
    b.add_triangle_mesh([[-3, -3, 4.9], [3, -3, 4.9], [3, 3, 4.9],
                         [-3, 3, 4.9]], [[0, 2, 1], [0, 3, 2]],
                        blackm, light_id=li)
    t0 = tfm.translate(*x0)
    t1 = None if x1 is None else tfm.translate(*x1)
    from pbrt_tpu.scene.ir import PRIM_SPHERE
    b.add_quadric(PRIM_SPHERE, t0, (0.7, -0.7, 0.7, 2 * np.pi), white,
                  object_to_world1=t1)
    return b.build()


def _render(scene, camera, W, H, spp=4, depth=2):
    cfg = SamplerConfig(kind="sobol", seed=0, spp=spp)
    pixel_ids = jnp.arange(W * H, dtype=jnp.uint32)

    @jax.jit
    def render_pass(scene, camera, s):
        ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, s, projective.generate_rays)
        return pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                   max_depth=depth) * weight[:, None]

    acc = 0.0
    for s in range(spp):
        acc = acc + np.asarray(render_pass(scene, camera, jnp.uint32(s)))
    img = (acc / spp).sum(-1).reshape(H, W)
    return img


def _camera(W, H):
    return projective.make_perspective(
        tfm.look_at([0, -6, 1], [0, 0, 0.5], [0, 0, 1]), 40.0, W, H,
        shutter_open=0.0, shutter_close=1.0)


def test_quadric_motion_blur_spreads_and_conserves():
    W = H = 48
    cam = _camera(W, H)
    img_a = _render(_scene((-1.0, 0, 0.5)), cam, W, H)
    img_b = _render(_scene((1.0, 0, 0.5)), cam, W, H)
    img_m = _render(_scene((-1.0, 0, 0.5), (1.0, 0, 0.5)), cam, W, H)

    # energy: blurred sphere reflects roughly the same light as either
    # static endpoint (shutter integral of a translating object)
    e_static = 0.5 * (img_a.sum() + img_b.sum())
    assert abs(img_m.sum() / e_static - 1.0) < 0.08, \
        (img_m.sum(), e_static)

    # spread: the moving sphere covers columns of BOTH endpoints
    # (black background: any lit column belongs to the sphere)
    def cols(img):
        prof = img.mean(0)
        on = prof > prof.max() * 0.02
        idx = np.nonzero(on)[0]
        return idx.min(), idx.max()
    la, ra = cols(img_a)
    lb, rb = cols(img_b)
    lm, rm = cols(img_m)
    assert lm <= la + 2 and rm >= rb - 2, ((la, ra), (lb, rb), (lm, rm))
    # and the blurred footprint is wider than either static one
    assert (rm - lm) > (ra - la) + 3


def test_camera_motion_blur():
    W = H = 48
    scene = _scene((0.0, 0, 0.5))
    # translate the camera sideways WITHOUT re-aiming (look_at at both
    # endpoints would keep the sphere centered and blur almost nothing)
    c2w0 = tfm.look_at([-0.8, -6, 1], [-0.8, 0, 0.5], [0, 0, 1])
    c2w1 = tfm.look_at([0.8, -6, 1], [0.8, 0, 0.5], [0, 0, 1])
    cam_static = projective.make_perspective(c2w0, 40.0, W, H)
    cam_anim = projective.make_perspective(
        c2w0, 40.0, W, H, cam_to_world1=c2w1)
    img_s = _render(scene, cam_static, W, H)
    img_m = _render(scene, cam_anim, W, H)
    # panning camera smears the sphere horizontally: row-profile variance
    # of the blurred image is wider
    def width(img):
        prof = img.mean(0)
        on = np.nonzero(prof > prof.max() * 0.02)[0]
        return on.max() - on.min()
    assert width(img_m) > width(img_s) + 3, (width(img_s), width(img_m))
