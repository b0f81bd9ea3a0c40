"""First-hit ray differentials + EWA anisotropic texture filtering.

Reference: camera.cpp:60-95 (probe-ray differentials),
interaction.cpp:43-87 (ComputeDifferentials plane projection),
mipmap.h:103 (EWA).  The TPU build computes screen-space uv gradients
at the first hit from regenerated probe rays and filters image
textures with Gaussian-weighted taps along the footprint's major axis
at the mip level of its minor axis.
"""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.parser.api import PbrtAPI
from pbrt_tpu.textures import textures as tex


QUAD_SCENE = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "sobol" "integer pixelsamples" [1]
Integrator "path" "integer maxdepth" [1]
WorldBegin
LightSource "distant" "color L" [3 3 3] "point from" [0 0 -1] "point to" [0 0 0]
Material "matte" "color Kd" [0.5 0.5 0.5]
Shape "trianglemesh" "point P" [-2 -2 0 2 -2 0 2 2 0 -2 2 0]
    "float uv" [0 0 1 0 1 1 0 1]
    "integer indices" [0 2 1 2 0 3]
WorldEnd
"""


def test_first_hit_duv_matches_analytic():
    """Center-pixel dudx on a fronto-parallel quad equals the pixel's
    world-space footprint times the quad's uv density (closed form)."""
    from pbrt_tpu.integrators import path as pathmod
    from pbrt_tpu.cameras import projective
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.ops import intersect as isect

    from pbrt_tpu.tools.pbrt import build_camera
    api = PbrtAPI()
    job = api.parse_string(QUAD_SCENE)
    scene = job.scene
    W = H = 32
    camera = build_camera(job, W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=1)
    pid = jnp.array([H // 2 * W + W // 2], jnp.uint32)
    sidx = jnp.zeros(1, jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pid, sidx, projective.generate_rays)
    rd = pathmod.camera_ray_differentials(
        camera, W, H, cfg, pid, sidx, projective.generate_rays, spp=1)
    hit = isect.intersect_full(scene, ray, ray_diff=rd)
    assert bool(hit.valid[0])
    duv = np.asarray(hit.duv[0])
    # analytic: plane at z=0, camera z=-3, fov 40 over 32 px; uv spans
    # [0,1] across 4 world units -> dudx = (2*tan(20deg)*3/32) / 4
    expect = 2.0 * np.tan(np.radians(20.0)) * 3.0 / 32 / 4.0
    assert abs(abs(duv[0]) - expect) < 0.15 * expect, (duv, expect)
    assert abs(abs(duv[3]) - expect) < 0.15 * expect, (duv, expect)
    # cross terms ~0 for an axis-aligned quad
    assert abs(duv[1]) < 0.1 * expect
    assert abs(duv[2]) < 0.1 * expect


def test_spp_scales_differentials():
    """ScaleDifferentials(1/sqrt(spp)) semantics (integrator.cpp:286)."""
    from pbrt_tpu.integrators import path as pathmod
    from pbrt_tpu.cameras import projective
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.ops import intersect as isect

    from pbrt_tpu.tools.pbrt import build_camera
    api = PbrtAPI()
    job = api.parse_string(QUAD_SCENE)
    W = H = 32
    camera = build_camera(job, W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=1)
    pid = jnp.array([H // 2 * W + W // 2], jnp.uint32)
    sidx = jnp.zeros(1, jnp.uint32)
    ray, *_ , pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pid, sidx, projective.generate_rays)
    d1 = isect.intersect_full(job.scene, ray,
                              ray_diff=pathmod.camera_ray_differentials(
                                  camera, W, H, cfg, pid, sidx,
                                  projective.generate_rays, spp=1)).duv
    d4 = isect.intersect_full(job.scene, ray,
                              ray_diff=pathmod.camera_ray_differentials(
                                  camera, W, H, cfg, pid, sidx,
                                  projective.generate_rays, spp=4)).duv
    np.testing.assert_allclose(np.asarray(d4), np.asarray(d1) / 2.0,
                               rtol=0.05, atol=1e-6)


def _stripe_texture():
    """64x64 image with horizontal stripes: varies in v, constant in u."""
    img = np.zeros((64, 64, 3), np.float32)
    img[0::2, :, :] = 1.0
    tt = tex.TextureTable()
    tid = tt.add(tex.TEX_IMAGE, image=img)
    imgs, types, params, c1, c2 = tt.arrays()
    return (jnp.asarray(imgs), jnp.asarray(types), jnp.asarray(params),
            jnp.asarray(c1), jnp.asarray(c2), tid)


def test_ewa_anisotropic_beats_isotropic():
    """Footprint elongated along u on a v-striped texture: the EWA path
    must keep the stripes sharp (averaging along u doesn't mix stripes)
    while the isotropic cone lookup at the same max-axis diameter blurs
    them toward the 0.5 mean — the exact artifact mipmap.h:103's EWA
    exists to avoid."""
    imgs, types, params, c1, c2, tid = _stripe_texture()
    B = 16
    # sample points centered on stripe rows (v at texel centers)
    v_rows = (np.arange(B) % 8) * 2 + 0.5        # texel row index
    uv = jnp.stack([jnp.full(B, 0.5), jnp.asarray(v_rows / 64.0)], -1)
    ti = jnp.full(B, tid, jnp.int32)
    pw = jnp.zeros((B, 3))
    # anisotropic footprint at the MAX_ANISO=8 eccentricity limit:
    # 8 canvas texels wide in u, 1 texel in v (no clamp-induced blur)
    duv = jnp.tile(jnp.asarray([[1.0 / 32.0, 0.0, 0.0, 1.0 / 256.0]]),
                   (B, 1))
    out_ewa = np.asarray(tex.eval_texture(
        imgs, types, params, c1, c2, ti, uv, pw, duv=duv))
    out_iso = np.asarray(tex.eval_texture(
        imgs, types, params, c1, c2, ti, uv, pw,
        uv_width=jnp.full(B, 1.0 / 32.0)))
    stripe_val = (v_rows.astype(np.int32) % 2 == 0).astype(np.float32)
    err_ewa = np.abs(out_ewa[:, 0] - stripe_val).mean()
    err_iso = np.abs(out_iso[:, 0] - stripe_val).mean()
    assert err_ewa < 0.15, err_ewa
    assert err_iso > 0.3, err_iso        # the cone path really does blur
    assert err_ewa < err_iso / 2


def test_render_with_differentials_smoke():
    """End-to-end: glancing-angle imagemap floor renders finite with the
    ray-differential path enabled (render() wires it automatically for
    projective cameras + image textures)."""
    import tempfile, os
    from pbrt_tpu.tools.pbrt import run_job
    from pbrt_tpu.film import film as filmmod
    img = np.zeros((32, 32, 3), np.float32)
    img[:, :, :] = 0.5
    img[0::2] = 1.0
    with tempfile.TemporaryDirectory() as td:
        pth = os.path.join(td, "stripes.exr")
        from pbrt_tpu.film.io import write_exr
        write_exr(pth, img)
        scene = f"""
LookAt 0 1 -6  0 0 2  0 1 0
Camera "perspective" "float fov" [35]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [2]
WorldBegin
LightSource "distant" "color L" [3 3 3] "point from" [0 1 -1] "point to" [0 0 0]
Texture "floor" "color" "imagemap" "string filename" ["{pth}"]
Material "matte" "texture Kd" "floor"
Shape "trianglemesh" "point P" [-8 0 -8 8 0 -8 8 0 8 -8 0 8]
    "float uv" [0 0 8 0 8 8 0 8]
    "integer indices" [0 2 1 2 0 3]
WorldEnd
"""
        api = PbrtAPI()
        job = api.parse_string(scene)
        film, camera = run_job(job, spp=4, progress=False, quiet=True)
        out = np.asarray(filmmod.develop_rgb(film))
    assert np.isfinite(out).all()
    assert out.max() > 0.01


MIRROR_SCENE = """
LookAt 0 1 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "sobol" "integer pixelsamples" [1]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "distant" "color L" [3 3 3] "point from" [0 -1 -1] "point to" [0 0 0]
AttributeBegin
Material "mirror"
Shape "trianglemesh" "point P" [-3 0 -3  3 0 -3  3 0 3  -3 0 3]
    "integer indices" [0 2 1 0 3 2]
AttributeEnd
AttributeBegin
Material "matte" "color Kd" [0.6 0.6 0.6]
Shape "trianglemesh" "point P" [-3 0 4  3 0 4  3 6 4  -3 6 4]
    "float uv" [0 0 1 0 1 1 0 1]
    "integer indices" [0 1 2 2 3 0]
AttributeEnd
WorldEnd
"""


def test_specular_chain_propagates_differentials():
    """VERDICT r4 item 7: ray differentials must propagate through
    specular bounces (SpecularReflect dndx machinery, integrator.cpp:
    344-429).  A camera ray reflecting off a flat mirror floor onto a
    textured wall must carry nonzero duv at the WALL hit, and the
    propagated dudx must match a finite difference of the actual
    neighboring-pixel reflected path (ground truth, flat mirror =>
    exact to first order)."""
    from pbrt_tpu.integrators import path as pathmod
    from pbrt_tpu.cameras import projective
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.ops import intersect as isect
    from pbrt_tpu.tools.pbrt import build_camera

    job = PbrtAPI().parse_string(MIRROR_SCENE)
    scene = job.scene
    W = H = 32
    camera = build_camera(job, W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=1)

    # capture the second-bounce hit (wall) duv via a trace_pair spy
    captured = []
    orig = isect.trace_pair

    def spy(scene_, nray, sray, ignore_light=None, ray_diff=None):
        hit, occ = orig(scene_, nray, sray, ignore_light=ignore_light,
                        ray_diff=ray_diff)
        captured.append((np.asarray(hit.duv) if hit.duv is not None
                         else None, np.asarray(hit.uv),
                         np.asarray(hit.valid)))
        return hit, occ

    # pixels looking DOWN at the mirror (lower half of the image)
    pids = np.array([24 * W + 10, 24 * W + 16, 26 * W + 16],
                    np.uint32)
    B = len(pids)
    isect.trace_pair = spy
    try:
        ray, weight, pf, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, jnp.asarray(pids), jnp.uint32(0),
            projective.generate_rays)
        rd = pathmod.camera_ray_differentials(
            camera, W, H, cfg, pid, sidx, projective.generate_rays, 1)
        pathmod.trace_paths(scene, ray, pid, sidx, cfg, max_depth=3,
                            ray_diff=rd)
    finally:
        isect.trace_pair = orig
    # first spy call = bounce-1 trace (wall hits for mirror pixels)
    duv1, uv1, valid1 = captured[0]
    assert duv1 is not None
    ok = valid1 & (np.abs(duv1).sum(-1) > 0)
    assert ok.any(), "no propagated differentials at the wall hit"

    # ground truth: trace the SAME probe rays the propagation started
    # from analytically through the flat mirror (y=0 plane, reflect,
    # wall z=4 with u=(x+3)/6, v=y/6) — exact, no jitter confound
    rxo, rxd, ryo, ryd = [np.asarray(a) for a in rd]
    ro, rdir = np.asarray(ray.o), np.asarray(ray.d)

    def wall_uv_analytic(o, d):
        t1 = -o[:, 1] / d[:, 1]
        p1 = o + t1[:, None] * d
        d2 = d * np.array([1.0, -1.0, 1.0])
        t2 = (4.0 - p1[:, 2]) / d2[:, 2]
        p2 = p1 + t2[:, None] * d2
        return np.stack([(p2[:, 0] + 3.0) / 6.0, p2[:, 1] / 6.0], -1)

    uv0 = wall_uv_analytic(ro, rdir)
    duv_x = wall_uv_analytic(rxo, rxd) - uv0
    duv_y = wall_uv_analytic(ryo, ryd) - uv0
    for i in range(B):
        if not ok[i]:
            continue
        pred = duv1[i]                      # [dudx,dvdx,dudy,dvdy]
        want = np.concatenate([duv_x[i], duv_y[i]])
        denom = max(np.abs(want).max(), 1e-6)
        assert np.abs(pred - want).max() < 0.1 * denom + 1e-4, \
            (i, pred, want)
