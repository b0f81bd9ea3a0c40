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


def test_mip_selection_end_to_end(tmp_path):
    """Ray-cone mip selection through the integrator: rays hitting a
    striped floor up close resolve the stripes (fine level); the same
    stripes hit from far away average to the texture mean (coarse
    level).  Exercises Hit.uv_density * t * tex_spread -> level
    (reference: MIPMap + ray differentials)."""
    import jax.numpy as jnp
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.core import geometry as geom
    from pbrt_tpu.integrators import path as pathmod
    from pbrt_tpu.samplers.samplers import SamplerConfig
    from pbrt_tpu.film.io import write_pfm
    from pbrt_tpu.textures.textures import RES

    img = np.zeros((RES, RES, 3), np.float32)
    img[:, ::2] = 1.0                   # stripes along u, mean 0.5
    tex_path = str(tmp_path / "stripes.pfm")
    write_pfm(tex_path, img)

    src = f"""
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
AttributeBegin
  LightSource "distant" "color L" [4 4 4] "point from" [0 0 1]
              "point to" [0 0 0]
AttributeEnd
Texture "st" "color" "imagemap" "string filename" "{tex_path}"
Material "matte" "texture Kd" "st"
Shape "trianglemesh" "integer indices" [0 1 2 2 3 0]
  "point P" [-50 -50 0  50 -50 0  50 50 0  -50 50 0]
  "float uv" [0 0  1 0  1 1  0 1]
WorldEnd
"""
    job = PbrtAPI().parse_string(src)
    scene = job.scene
    cfg = SamplerConfig(kind="sobol", seed=0, spp=1)
    B = 64
    # stripe period = 2 texels = (2/256)*100 world units; sweep x at
    # half-period steps so adjacent rays land on opposite stripes
    xs = (np.arange(B) * (100.0 / RES * 0.5) - 12.0).astype(np.float32)

    def shade(dist):
        o = np.stack([xs, np.zeros(B, np.float32),
                      np.full(B, dist, np.float32)], -1)
        d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (B, 1))
        ray = geom.Ray.make(jnp.asarray(o), jnp.asarray(d))
        L = pathmod.trace_paths(scene, ray, jnp.arange(B, dtype=jnp.uint32),
                                jnp.zeros(B, jnp.uint32), cfg,
                                max_depth=1, tex_spread=0.01)
        return np.asarray(L).mean(-1)

    near = shade(2.0)       # footprint ~ level 0: stripes resolved
    far = shade(400.0)      # footprint ~ level 3+: averaged to mean
    assert near.std() > 5 * max(far.std(), 1e-6), (near.std(), far.std())
    ratio = far.mean() / max(near.mean(), 1e-9)
    assert 0.7 < ratio < 1.4, ratio
