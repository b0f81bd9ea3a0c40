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


def test_mesh_motion_blur():
    """Two-keyframe TRIANGLE MESH motion (VERDICT r2 item 5; reference
    TransformedPrimitive + AnimatedTransform, primitive.cpp:73-89 +
    transform.cpp:255+): a quad translating across the frame must (a)
    intersect at its time-t position per ray, (b) blur across the
    shutter in a render, (c) match the static render at shutter [0,0]."""
    import numpy as np
    import jax.numpy as jnp
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.core import geometry as geom
    from pbrt_tpu.ops import intersect as isect

    def scene_text(shutter):
        return f"""
        LookAt 0 0 5  0 0 0  0 1 0
        Camera "perspective" "float fov" [60]
            "float shutteropen" [{shutter[0]}]
            "float shutterclose" [{shutter[1]}]
        Film "image" "integer xresolution" [32] "integer yresolution" [32]
        WorldBegin
        LightSource "distant" "rgb L" [3 3 3] "point from" [0 0 5]
        Material "matte" "rgb Kd" [.8 .8 .8]
        ActiveTransform EndTime
        Translate 2 0 0
        ActiveTransform All
        Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
            "integer indices" [0 1 2 2 3 0]
        WorldEnd
        """

    job = PbrtAPI().parse_string(scene_text((0.0, 1.0)))
    scene = job.scene
    assert scene.has_animated_mesh
    # animated meshes now keep the MXU path via time-coefficient tables
    assert scene.use_dense and scene.dense_motion

    # (a) time-dependent intersection: a ray at x=1.5 only hits the quad
    # once it has translated far enough (x in [-1+2t, 1+2t])
    o = jnp.asarray([[1.5, 0.0, 5.0]] * 3, jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 3, jnp.float32)
    ray = geom.Ray.make(o, d, time=jnp.asarray([0.0, 0.5, 1.0]))
    t, prim, _, _, found = isect.intersect(scene, ray)
    found = np.asarray(found)
    assert not found[0]                 # at t=0 the quad spans [-1, 1]
    assert found[1] and found[2]        # at t>=0.25 it covers x=1.5

    # (b)/(c) render-level: shutter [0,0] must match a static render,
    # and a full shutter must spread energy over the swept region
    from pbrt_tpu.tools.pbrt import run_job
    film0, _ = run_job(PbrtAPI().parse_string(scene_text((0.0, 0.0))),
                       spp=16, max_depth=1, quiet=True, progress=False)
    filmb, _ = run_job(job, spp=16, max_depth=1, quiet=True,
                       progress=False)
    img0 = np.asarray(film0.weighted).sum(-1)
    imgb = np.asarray(filmb.weighted).sum(-1)
    # raster x is MIRRORED w.r.t. world +x for this LookAt (camera
    # right = -x), so the +2 world sweep blurs toward raster col 0.
    # static: nothing left of the quad's edge; blurred: energy there
    assert img0[:, :6].max() < 1e-4
    assert imgb[16, :6].max() > 1e-3
    # a mid-sweep column is dimmer than the always-covered center
    assert imgb[16, 2] < 0.9 * imgb[16, 14] + 1e-6


def test_mesh_motion_dense_matches_bvh():
    """VERDICT r3 item 7: the dense MXU path must handle animated meshes
    (time-polynomial Pluecker tables + per-ray Horner in the kernel,
    build_dense_tables_motion) and agree with the BVH path's per-ray
    vertex interpolation at every shutter time."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.core import geometry as geom
    from pbrt_tpu.ops import intersect as isect

    job = PbrtAPI().parse_string("""
    LookAt 0 0 5  0 0 0  0 1 0
    Camera "perspective" "float fov" [60]
        "float shutteropen" [0] "float shutterclose" [1]
    Film "image" "integer xresolution" [32] "integer yresolution" [32]
    WorldBegin
    LightSource "distant" "rgb L" [3 3 3] "point from" [0 0 5]
    Material "matte" "rgb Kd" [.8 .8 .8]
    ActiveTransform EndTime
    Translate 2 0 0.5
    Rotate 25 0 0 1
    ActiveTransform All
    Shape "trianglemesh" "point P" [-1 -1 0  1 -1 0  1 1 0  -1 1 0]
        "integer indices" [0 1 2 2 3 0]
    Shape "trianglemesh" "point P" [-3 -3 -2  3 -3 -2  3 3 -2  -3 3 -2]
        "integer indices" [0 1 2 2 3 0]
    WorldEnd
    """)
    scene = job.scene
    assert scene.use_dense and scene.dense_motion

    rs = np.random.RandomState(5)
    B = 512
    o = jnp.asarray(rs.randn(B, 3) * np.array([2.0, 2.0, 0.2])
                    + np.array([0.5, 0, 5.0]), jnp.float32)
    d = geom.normalize(jnp.asarray(
        rs.randn(B, 3) * np.array([0.6, 0.6, 0.2])
        + np.array([0, 0, -1.0]), jnp.float32))
    tm = jnp.asarray(rs.rand(B), jnp.float32)
    ray = geom.Ray.make(o, d, time=tm)

    # BVH path (default off-TPU)
    t_b, p_b, _, _, f_b = isect.intersect(scene, ray)
    # dense path via the Pallas interpreter
    isect.FORCE_DENSE_INTERPRET = True
    jax.clear_caches()
    try:
        t_d, p_d, _, _, f_d = isect.intersect(scene, ray)
    finally:
        isect.FORCE_DENSE_INTERPRET = False
        jax.clear_caches()
    f_b, f_d = np.asarray(f_b), np.asarray(f_d)
    assert (f_b == f_d).mean() > 0.995, (f_b.sum(), f_d.sum())
    both = f_b & f_d
    assert both.sum() > 50
    rel = np.abs(np.asarray(t_d)[both] - np.asarray(t_b)[both]) \
        / np.maximum(np.asarray(t_b)[both], 1e-6)
    assert np.quantile(rel, 0.99) < 2e-3, np.quantile(rel, 0.99)
    assert (np.asarray(p_d)[both] == np.asarray(p_b)[both]).mean() > 0.99
