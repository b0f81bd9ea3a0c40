"""Light-tracing (adjoint) integrator tests — foundations of the
bidirectional family (reference bdpt.cpp t=1 strategies)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.cameras import projective
from pbrt_tpu.film import film as filmmod
from pbrt_tpu.integrators import path as pathint, lighttracer
from pbrt_tpu.samplers.samplers import SamplerConfig


def _scene():
    b = SceneBuilder()
    white = b.add_material(MaterialSpec(kd=np.full(31, 0.6, np.float32)))
    black = b.add_material(MaterialSpec())
    li = b.add_area_light(np.full(31, 8.0, np.float32))
    b.add_triangle_mesh([[-1, -1, 3], [1, 1, 3], [1, -1, 3], [-1, 1, 3]],
                        [[0, 1, 2], [0, 3, 1]], black, light_id=li)
    b.add_triangle_mesh([[-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0]],
                        [[0, 1, 2], [2, 3, 0]], white)
    return b.build()


def test_light_tracing_matches_forward():
    """Adjoint transport must agree with forward path tracing."""
    scene = _scene()
    W = H = 32
    cam = projective.make_perspective(
        tfm.look_at([0, -6, 2.5], [0, 0, 1], [0, 0, 1]), 40.0, W, H)
    fwd = pathint.render(scene, cam, filmmod.make_film(W, H),
                         SamplerConfig("independent", 0, 32),
                         spp=32, max_depth=3)
    img_f = np.asarray(filmmod.develop_spectral(fwd))
    f2, scale = lighttracer.render_lighttracer(
        scene, cam, filmmod.make_film(W, H),
        SamplerConfig("independent", 7, 32), spp=32, max_depth=3,
        photons_per_pass=W * H * 4)
    img_l = np.asarray(filmmod.develop_spectral(f2, splat_scale=scale))
    m_f = img_f[18:30, 8:24].mean()
    m_l = img_l[18:30, 8:24].mean()
    assert abs(m_l / m_f - 1.0) < 0.1, (m_f, m_l)
    # the splat path (not the weighted path) carried the energy
    assert float(jnp.abs(f2.splat).sum()) > 0
    assert float(jnp.abs(f2.weighted).sum()) == 0


def test_sample_le_flux():
    """Photon throughput equals emitted power for a diffuse area light."""
    scene = _scene()
    B = 20000
    rs = np.random.RandomState(0)
    l = jnp.zeros(B, jnp.int32)
    o, d, Le, pdf, n_l = lighttracer.sample_le(
        scene, l,
        jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)))
    import pbrt_tpu.core.geometry as geom
    cos0 = np.abs(np.asarray(geom.dot(n_l, d)))
    beta0 = 8.0 * cos0 / np.maximum(np.asarray(pdf), 1e-12)
    # E[beta] = Phi = Le * pi * area (area = 2x2 quad = 4)
    assert abs(beta0.mean() - 8.0 * np.pi * 4.0) / (8 * np.pi * 4) < 0.02
    # all photons start on the light quad at z=3 heading downward
    assert np.allclose(np.asarray(o)[:, 2], 3.0, atol=1e-3)
    assert (np.asarray(d)[:, 2] < 0).all()


def test_mlt_matches_forward():
    """PSSMLT must converge to the forward path-traced image."""
    from pbrt_tpu.integrators import mlt
    scene = _scene()
    W = H = 24
    cam = projective.make_perspective(
        tfm.look_at([0, -6, 2.5], [0, 0, 1], [0, 0, 1]), 40.0, W, H)
    fwd = pathint.render(scene, cam, filmmod.make_film(W, H),
                         SamplerConfig("independent", 0, 32),
                         spp=32, max_depth=3)
    img_f = np.asarray(filmmod.develop_spectral(fwd))
    img_m, b = mlt.render_mlt(scene, cam, W, H, n_chains=4096,
                              mutations_per_chain=48, n_bootstrap=16384,
                              max_depth=3)
    assert b > 0
    m, f = np.asarray(img_m)[14:23, 4:20].mean(), img_f[14:23, 4:20].mean()
    assert abs(m / f - 1) < 0.1, (m, f)
