"""Gradient correctness: reverse-mode vs central finite differences
(BASELINE config #5 / north-star gradient criterion)."""
import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.scene.ir import SceneBuilder, MaterialSpec, MAT_MATTE
from pbrt_tpu.core import transform as tfm
from pbrt_tpu.cameras import projective
from pbrt_tpu.integrators import diff, path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig


def _setup():
    b = SceneBuilder()
    m = b.add_material(MaterialSpec(type=MAT_MATTE,
                                    kd=np.full(31, 0.5, np.float32)))
    b.add_sphere(tfm.Transform(), 1.0, m)
    b.add_infinite_light(np.full(31, 1.0, np.float32))
    scene = b.build()
    W = H = 8
    cam = projective.make_perspective(
        tfm.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 30.0, W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=4)
    return scene, cam, W, H, cfg


def test_grad_albedo_matches_fd():
    scene, cam, W, H, cfg = _setup()
    pixel_ids = jnp.arange(W * H, dtype=jnp.uint32)
    target = jnp.full((W * H, 31), 0.3)

    def loss(params):
        return diff.render_loss(params, scene, cam, W, H, cfg, pixel_ids,
                                (0, 1), target, max_depth=3)

    params = {"mat_kd": scene.mat_kd}
    g = jax.grad(loss)(params)["mat_kd"]
    # check several spectral bins by finite difference
    for idx in [0, 5, 15, 30]:
        fd = diff.finite_difference_grad(loss, params, "mat_kd", idx,
                                         eps=2e-3)
        ad = float(np.asarray(g).flat[idx])
        assert abs(ad - fd) < max(3e-3, 0.05 * abs(fd)), (idx, ad, fd)


def test_grad_emission_matches_fd():
    scene, cam, W, H, cfg = _setup()
    pixel_ids = jnp.arange(W * H, dtype=jnp.uint32)
    target = jnp.zeros((W * H, 31))

    def loss(params):
        p = {"env_map": params["env_map"]}
        return diff.render_loss(p, scene, cam, W, H, cfg, pixel_ids,
                                (0,), target, max_depth=2)

    params = {"env_map": scene.env_map}
    g = jax.grad(loss)(params)["env_map"]
    fd = diff.finite_difference_grad(loss, params, "env_map", 10, eps=2e-3)
    ad = float(np.asarray(g).flat[10])
    assert abs(ad - fd) < max(3e-3, 0.05 * abs(fd)), (ad, fd)
    assert abs(ad) > 1e-5  # nonzero signal


def test_inverse_rendering_recovers_albedo():
    """Optimize kd to match a target render — loss must drop substantially."""
    scene, cam, W, H, cfg = _setup()
    pixel_ids = jnp.arange(W * H, dtype=jnp.uint32)
    # target: render with the TRUE albedo 0.8
    true_kd = jnp.full((1, 31), 0.8)
    tgt, pid = diff.render_samples({"mat_kd": true_kd}, scene, cam, W, H,
                                   cfg, pixel_ids, jnp.uint32(0),
                                   max_depth=3)
    init, step = diff.make_train_step(scene, cam, W, H, cfg, tgt,
                                      max_depth=3, learning_rate=0.1)
    params = {"mat_kd": jnp.full((1, 31), 0.3)}
    opt_state = init(params)
    losses = []
    for it in range(30):
        params, opt_state, loss = step(params, opt_state, pixel_ids,
                                       jnp.uint32(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.05, losses[::10]
    got = float(np.asarray(params["mat_kd"]).mean())
    assert abs(got - 0.8) < 0.05, got
