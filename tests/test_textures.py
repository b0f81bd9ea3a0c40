"""Texture system tests (reference: src/textures/*)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.parser.api import PbrtAPI
from pbrt_tpu.textures import textures as tex


def _render_scene(text, n=16, spp=8):
    from pbrt_tpu.tools.pbrt import run_job
    api = PbrtAPI()
    job = api.parse_string(text)
    from pbrt_tpu.film import film as filmmod
    film, camera = run_job(job, spp=spp, progress=False, quiet=True)
    return np.asarray(filmmod.develop_rgb(film)), job


CHECKER_SCENE = """
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [32] "integer yresolution" [32]
Sampler "sobol" "integer pixelsamples" [8]
Integrator "path" "integer maxdepth" [1]
WorldBegin
LightSource "distant" "color L" [3 3 3] "point from" [0 0 -1] "point to" [0 0 0]
Texture "checks" "color" "checkerboard" "float uscale" [4] "float vscale" [4]
    "color tex1" [1 0 0] "color tex2" [0 0 1]
Material "matte" "texture Kd" "checks"
Shape "trianglemesh" "point P" [-2 -2 0 2 -2 0 2 2 0 -2 2 0]
    "float uv" [0 0 1 0 1 1 0 1]
    "integer indices" [0 2 1 2 0 3]
WorldEnd
"""


def test_checkerboard_renders_two_colors():
    img, job = _render_scene(CHECKER_SCENE)
    assert job.scene.tex_type.shape[0] == 2  # default + checker
    lit = img[img.sum(-1) > 0.05]
    assert len(lit) > 100
    red = lit[:, 0] > lit[:, 2]
    # both colors present in roughly equal proportion
    assert 0.25 < red.mean() < 0.75, red.mean()
    # strongly saturated: red cells have low blue and vice versa
    assert (lit[red][:, 0] / np.maximum(lit[red][:, 2], 1e-6)).mean() > 3


def test_perlin_noise_range_and_smoothness():
    rs = np.random.RandomState(0)
    p = jnp.asarray(rs.rand(1000, 3).astype(np.float32) * 10)
    n = np.asarray(tex.perlin(p))
    assert np.abs(n).max() <= 1.5
    assert n.std() > 0.05
    # smoothness: tiny perturbation changes noise only slightly
    n2 = np.asarray(tex.perlin(p + 1e-4))
    assert np.abs(n2 - n).max() < 1e-2


def test_image_texture_eval():
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = [1, 0, 0]
    img[:, 4:] = [0, 1, 0]
    tt = tex.TextureTable()
    tid = tt.add(tex.TEX_IMAGE, image=img)
    imgs, types, params, c1, c2 = tt.arrays()
    uv = jnp.asarray([[0.2, 0.5], [0.8, 0.5]])
    out = np.asarray(tex.eval_texture(
        jnp.asarray(imgs), jnp.asarray(types), jnp.asarray(params),
        jnp.asarray(c1), jnp.asarray(c2),
        jnp.full(2, tid, jnp.int32), uv, jnp.zeros((2, 3))))
    assert out[0, 0] > 0.8 and out[0, 1] < 0.2      # left = red
    assert out[1, 1] > 0.8 and out[1, 0] < 0.2      # right = green


def test_constant_material_unaffected():
    # lanes with tex_idx=-1 return 1.0 (constants keep their value)
    tt = tex.TextureTable()
    imgs, types, params, c1, c2 = tt.arrays()
    out = np.asarray(tex.eval_texture(
        jnp.asarray(imgs), jnp.asarray(types), jnp.asarray(params),
        jnp.asarray(c1), jnp.asarray(c2),
        jnp.full(3, -1, jnp.int32), jnp.zeros((3, 2)), jnp.zeros((3, 3))))
    assert np.allclose(out, 1.0)


def test_mip_pyramid_and_trilinear():
    """Mip canvas layout + footprint-driven level selection
    (reference core/mipmap.h trilinear Lookup)."""
    import jax.numpy as jnp
    from pbrt_tpu.textures import textures as tex
    R = tex.RES
    # high-frequency checker image: level 0 alternates 0/1, coarse
    # levels average to 0.5
    img = np.zeros((R, R, 3), np.float32)
    img[::2, :] = 1.0
    canvas = tex.build_pyramid(img)
    assert canvas.shape == (2 * R, R, 3)
    # level 1 is the 2x2 box average = 0.5 everywhere
    off1 = 2 * R - (2 * R >> 1)
    assert np.allclose(canvas[off1:off1 + R // 2, :R // 2], 0.5)
    # top of pyramid is the global mean
    offL = 2 * R - (2 * R >> tex.MAX_LEVEL)
    assert np.allclose(canvas[offL, 0], 0.5)

    tt = tex.TextureTable()
    tid = tt.add(tex.TEX_IMAGE, image=img)
    imgs, types, params, c1, c2 = tt.arrays()
    args = (jnp.asarray(imgs), jnp.asarray(types), jnp.asarray(params),
            jnp.asarray(c1), jnp.asarray(c2))
    uv = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (64, 2)),
                     jnp.float32)
    ti = jnp.full((64,), tid, jnp.int32)
    pw = jnp.zeros((64, 3))
    # tiny footprint: fine level, values ~0 or ~1 (high variance)
    fine = np.asarray(tex.eval_texture(*args, ti, uv, pw,
                                       uv_width=jnp.full((64,), 1e-6)))
    # huge footprint: coarse level, everything ~0.5
    coarse = np.asarray(tex.eval_texture(*args, ti, uv, pw,
                                         uv_width=jnp.full((64,), 1.0)))
    assert fine.std() > 0.2, fine.std()
    assert np.allclose(coarse, 0.5, atol=0.05), (coarse.min(), coarse.max())
    # no-footprint call (None) matches a ~zero footprint
    none = np.asarray(tex.eval_texture(*args, ti, uv, pw))
    assert np.allclose(none, fine, atol=1e-5)


def test_uv_density_on_hits():
    """make_hit reports uv-per-world-unit for triangles."""
    import jax.numpy as jnp
    from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec, MAT_MATTE
    from pbrt_tpu.ops import intersect as isect
    from pbrt_tpu.core import geometry as geom
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(type=MAT_MATTE))
    # unit uv square over a 2x2 world quad: density = 1/2
    pts = [[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0]]
    b.add_triangle_mesh(pts, [[0, 1, 2], [2, 3, 0]], m,
                        uvs=[[0, 0], [1, 0], [1, 1], [0, 1]])
    scene = b.build()
    ray = geom.Ray.make(jnp.asarray([[1.0, 1.0, -3.0]]),
                        jnp.asarray([[0.0, 0.0, 1.0]]))
    hit = isect.intersect_full(scene, ray)
    assert bool(hit.valid[0])
    assert abs(float(hit.uv_density[0]) - 0.5) < 1e-3
