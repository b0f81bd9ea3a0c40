"""Camera-parameter gradients (north-star config #5: pixel grads w.r.t.
camera pose/fov, validated against finite differences + an
optimize-and-recover loop).

With detached sampling (the production estimator), AD returns the
derivative of the SMOOTH branch of the per-sample estimate: at fixed
random numbers each sample's radiance is piecewise-smooth in the camera
parameters, and AD matches finite differences wherever the finite step
does not cross a visibility/lobe-choice discontinuity.  The FD check
therefore uses a small step and compares per-pixel, requiring agreement
on the (large) majority of pixels; boundary-crossing pixels legitimately
disagree (edge-sampling is out of scope, as recorded in the README's
deviations)."""

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import diff
from pbrt_tpu.samplers.samplers import SamplerConfig

W = H = 24


def _setup():
    scene, cam_ctor = flagship.cornell(tessellate=False)
    camera = cam_ctor(W, H)
    cfg = SamplerConfig(kind="sobol", seed=0, spp=4)
    pixel_ids = jnp.arange(W * H, dtype=jnp.uint32)

    def render(params):
        L, _ = diff.render_samples(params, scene, camera, W, H, cfg,
                                   pixel_ids, jnp.uint32(0), max_depth=2)
        return L.sum(-1)          # [B] per-pixel luminance-ish

    return jax.jit(render)


def test_camera_grads_match_finite_differences():
    render = _setup()
    p = {"cam_delta": jnp.asarray([0.004, -0.003, 0.002,
                                   0.02, -0.015, 0.01]),
         "cam_fov": jnp.float32(50.4)}
    J = jax.jit(jax.jacrev(render))(p)
    assert np.isfinite(np.asarray(J["cam_delta"])).all()
    assert np.isfinite(np.asarray(J["cam_fov"])).all()

    for comp, key, eps in ((0, "cam_delta", 1e-4), (3, "cam_delta", 1e-4),
                           (None, "cam_fov", 2e-3)):
        def shift(d):
            q = dict(p)
            if key == "cam_fov":
                q[key] = p[key] + d
            else:
                arr = np.asarray(p[key]).copy()
                arr[comp] += d
                q[key] = jnp.asarray(arr)
            return np.asarray(render(q))

        fd = (shift(eps) - shift(-eps)) / (2 * eps)          # [B]
        ad = np.asarray(J[key] if key == "cam_fov"
                        else J[key][:, comp])
        # robust scale: boundary pixels carry enormous FD spikes (the
        # visibility-discontinuity flux AD intentionally omits); judge
        # agreement relative to the typical smooth-pixel magnitude
        scale = np.percentile(np.abs(fd), 75)
        sig = (np.abs(fd) > 0.2 * scale) & (np.abs(fd) < 20 * scale)
        rel = np.abs(ad - fd)[sig] / np.maximum(
            np.abs(fd[sig]), 0.2 * scale)
        frac = np.mean(rel < 0.1)
        assert frac > 0.7, (key, comp, frac, float(np.median(rel)))


def test_camera_pose_recovery():
    """Perturb the camera pose, optimize cam_delta back toward identity
    (inverse rendering against a target image; robust per-pixel loss so
    boundary-pixel outliers saturate instead of dominating)."""
    import optax
    render = _setup()
    target = jnp.asarray(np.asarray(render({"cam_delta": jnp.zeros(6),
                                            "cam_fov": jnp.float32(50.0)})))

    @jax.jit
    def loss_d(params):
        img = render({"cam_delta": params["cam_delta"],
                      "cam_fov": jnp.float32(50.0)})
        d2 = (img - target) ** 2
        return jnp.mean(d2 / (1.0 + d2))

    true_delta = np.asarray([0.004, -0.003, 0.002, 0.02, -0.015, 0.012])
    params = {"cam_delta": jnp.asarray(true_delta)}
    opt = optax.adam(2e-3)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss_d))
    err0 = float(np.linalg.norm(true_delta))
    for it in range(240):
        l, g = vg(params)
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
    err = float(np.linalg.norm(np.asarray(params["cam_delta"])))
    assert err < err0 * 0.3, (err0, err, float(l))
