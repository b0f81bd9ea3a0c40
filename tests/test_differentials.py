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
