"""Environment-map importance sampling tests (reference:
src/lights/infinite.cpp Distribution2D sampling)."""
import numpy as np
import jax.numpy as jnp

from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec
from pbrt_tpu.lights import lights as lmod
from pbrt_tpu.core import spectrum as spec


def _env_scene():
    b = SceneBuilder()
    b.add_material(MaterialSpec())
    # env map with a bright patch
    env = np.full((16, 32, 31), 0.1, np.float32)
    env[4:6, 10:14] = 25.0
    b.add_infinite_light(np.ones(31, np.float32), env_map=env)
    return b.build(), env


def test_env_sampling_matches_pdf():
    scene, env = _env_scene()
    B = 40000
    rs = np.random.RandomState(0)
    u1 = jnp.asarray(rs.rand(B).astype(np.float32))
    u2 = jnp.asarray(rs.rand(B).astype(np.float32))
    wi, pdf = lmod.sample_env_direction(scene, u1, u2)
    pdf = np.asarray(pdf)
    assert (pdf > 0).all()
    # E[1/pdf] over samples = total solid angle = 4pi
    est = (1.0 / pdf).mean()
    assert abs(est - 4 * np.pi) / (4 * np.pi) < 0.03, est
    # pdf_li agrees with the sampling pdf at the sampled directions
    pdf2 = np.asarray(lmod.pdf_li_infinite(scene, wi))
    ratio = pdf2 / pdf
    assert np.median(np.abs(ratio - 1)) < 0.05, np.median(ratio)


def test_env_importance_concentrates_on_bright_patch():
    scene, env = _env_scene()
    B = 20000
    rs = np.random.RandomState(1)
    wi, pdf = lmod.sample_env_direction(
        scene, jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)))
    lum = np.asarray(lmod._env_radiance(scene, wi)) @ spec.CIE_Y
    # most samples should land on the bright patch
    assert (lum > 10).mean() > 0.5


def test_env_integral_estimate():
    """Importance-sampled estimate of total env luminous power matches
    direct quadrature of the map."""
    scene, env = _env_scene()
    B = 200000
    rs = np.random.RandomState(2)
    wi, pdf = lmod.sample_env_direction(
        scene, jnp.asarray(rs.rand(B).astype(np.float32)),
        jnp.asarray(rs.rand(B).astype(np.float32)))
    lum = np.asarray(lmod._env_radiance(scene, wi)) @ spec.CIE_Y * 10 / \
        spec.CIE_Y_INTEGRAL
    est = (lum / np.asarray(pdf)).mean()
    # quadrature: sum over texels of L * sin(theta) dtheta dphi
    He, We = env.shape[:2]
    theta = (np.arange(He) + 0.5) / He * np.pi
    lum_map = env @ spec.CIE_Y * 10 / spec.CIE_Y_INTEGRAL
    ref = (lum_map * np.sin(theta)[:, None]).sum() * \
        (np.pi / He) * (2 * np.pi / We)
    assert abs(est - ref) / ref < 0.02, (est, ref)
