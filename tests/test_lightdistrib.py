"""Light-selection strategy tests (reference: src/core/lightdistrib.cpp)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.lights import distrib


def _two_light_scene():
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(kd=np.full(31, 0.5, np.float32)))
    b.add_triangle_mesh([[-50, -50, 0], [50, -50, 0], [50, 50, 0],
                         [-50, 50, 0]], [[0, 1, 2], [2, 3, 0]], m)
    b.add_point_light([-20, 0, 5], np.full(31, 100.0, np.float32))  # bright
    b.add_point_light([20, 0, 5], np.full(31, 1.0, np.float32))     # dim
    return b.build()


def test_power_strategy_prefers_bright_light():
    scene = _two_light_scene()
    B = 20000
    rs = np.random.RandomState(0)
    u = jnp.asarray(rs.rand(B).astype(np.float32))
    p = jnp.zeros((B, 3))
    l, pdf = distrib.select_light(scene, "power", p, u)
    frac_bright = float((np.asarray(l) == 0).mean())
    assert frac_bright > 0.95               # ~100:1 power ratio
    # pdf consistency: estimator sum(1/pdf * [l==i]) / B == 1 per light...
    # simpler: pmf matches empirical frequency
    pmf0 = float(scene.light_power_pmf[0])
    assert abs(frac_bright - pmf0) < 0.01


def test_spatial_strategy_prefers_nearby_light():
    scene = _two_light_scene()
    B = 10000
    rs = np.random.RandomState(1)
    u = jnp.asarray(rs.rand(B).astype(np.float32))
    # shading points near the DIM light at +20: distance beats power only
    # partially (power 100:1, dist^2 ~ (40^2)/(5^2) = 64:1) — near light
    # must be chosen far more often than under the power strategy
    p_near_dim = jnp.broadcast_to(jnp.asarray([20.0, 0.0, 1.0]), (B, 3))
    l_sp, _ = distrib.select_light(scene, "spatial", p_near_dim, u)
    l_pw, _ = distrib.select_light(scene, "power", p_near_dim, u)
    frac_dim_spatial = float((np.asarray(l_sp) == 1).mean())
    frac_dim_power = float((np.asarray(l_pw) == 1).mean())
    assert frac_dim_spatial > 3 * frac_dim_power, (frac_dim_spatial,
                                                   frac_dim_power)


def test_strategies_unbiased():
    """A path render must converge to the same image under all strategies."""
    from pbrt_tpu.cameras import projective
    from pbrt_tpu.film import film as filmmod
    from pbrt_tpu.integrators import path as pathint
    from pbrt_tpu.samplers.samplers import SamplerConfig
    scene = _two_light_scene()
    cam = projective.make_orthographic(
        tfm.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]), 16, 16,
        screen=(-30, 30, -30, 30))
    means = {}
    for strat in ("uniform", "power", "spatial"):
        film = pathint.render(
            scene, cam, filmmod.make_film(16, 16),
            SamplerConfig("sobol", 0, 64), spp=64, max_depth=1,
            trace_kwargs={"light_strategy": strat})
        means[strat] = float(np.asarray(
            filmmod.develop_spectral(film)).mean())
    ref = means["uniform"]
    for strat, m in means.items():
        assert abs(m / ref - 1) < 0.05, means


def test_bump_mapping_varies_shading():
    """A bump-mapped flat plane under angled light shows shading variation
    (reference: Material::Bump, material.cpp:50+)."""
    from pbrt_tpu.parser.api import PbrtAPI
    from pbrt_tpu.tools.pbrt import run_job
    from pbrt_tpu.film import film as filmmod
    job = PbrtAPI().parse_string("""
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "image" "integer xresolution" [24] "integer yresolution" [24]
Sampler "sobol" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [1]
WorldBegin
LightSource "distant" "color L" [3 3 3] "point from" [-1 1 -1] "point to" [0 0 0]
Texture "bumps" "float" "fbm" "float scale" [8]
Material "matte" "color Kd" [.6 .6 .6] "texture bumpmap" "bumps"
Shape "trianglemesh" "point P" [-2 -2 0 2 -2 0 2 2 0 -2 2 0]
  "float uv" [0 0 1 0 1 1 0 1] "integer indices" [0 2 1 2 0 3]
WorldEnd""")
    film, _ = run_job(job, quiet=True, progress=False)
    img = np.asarray(filmmod.develop_spectral(film))[:, :, 0]
    rel = img[4:20, 4:20].std() / max(img[4:20, 4:20].mean(), 1e-9)
    assert rel > 0.02, rel


def test_projection_light_mask():
    """Projection light illuminates only within its cone, modulated by the
    projected image (reference: lights/projection.cpp)."""
    from pbrt_tpu.scene import ir
    from pbrt_tpu.lights import lights as lmod
    from pbrt_tpu.textures import textures as texmod
    import jax.numpy as jnp
    b = SceneBuilder()
    b.add_material(MaterialSpec())
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = 1.0
    tid = b.textures.add(texmod.TEX_IMAGE, image=img)
    b.add_light(type=ir.LIGHT_PROJECTION, pos=np.zeros(3, np.float32),
                dir=np.asarray([0, 0, 1], np.float32),
                L=np.full(31, 10.0, np.float32),
                params=np.asarray([0, 0, tid,
                                   np.cos(np.radians(30))], np.float32))
    scene = b.build()
    p = jnp.asarray([[-0.2, 0.0, 2.0], [0.2, 0.0, 2.0], [3.0, 0.0, 1.0]])
    wi, li, pdf, dist, delta = lmod.sample_li(
        scene, jnp.zeros(3, jnp.int32), p, jnp.zeros((3, 3)),
        jnp.zeros(3), jnp.zeros(3))
    assert float(li[0, 0]) > 0.5       # bright half of the slide
    assert float(li[1, 0]) < 1e-6      # dark half
    assert float(li[2, 0]) < 1e-6      # outside the cone
    assert bool(delta.all())
