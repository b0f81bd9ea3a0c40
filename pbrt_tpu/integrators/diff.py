"""Differentiable rendering: the capability the reference does not have.

Reverse-mode pixel gradients w.r.t. scene parameters (material albedo /
emission spectra, camera pose) through the wavefront path loop.  The bounce
loop is statically unrolled, so `jax.grad` differentiates the whole
estimator; discrete sampling decisions (lobe choice, RR, visibility) are
step functions with zero gradient — the standard detached-sampling
estimator, unbiased for albedo/emission parameters (BASELINE config #5).

`render_loss` + `train_step` implement inverse rendering; both are
`shard_map`-compatible: under a mesh, per-device gradients are psum'd by
grad's transpose of the sharded loss mean automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig


# scene leaves that are differentiable targets
DIFFERENTIABLE_FIELDS = ("mat_kd", "mat_ks", "mat_kr", "mat_kt", "light_L",
                         "env_map")

# camera parameters (north-star config #5: gradients w.r.t. camera):
#   cam_delta [6] — se(3) pose perturbation (rx,ry,rz, tx,ty,tz) composed
#                   onto cam_to_world
#   cam_fov   []  — perspective field of view in degrees
CAMERA_PARAM_KEYS = ("cam_delta", "cam_fov")


def _so3_exp(r):
    """Rodrigues: axis-angle [3] -> rotation matrix [3,3] (differentiable
    incl. at r=0 via the taylor-safe sinc forms)."""
    theta2 = jnp.sum(r * r)
    theta = jnp.sqrt(theta2 + 1e-20)
    k = r / theta
    K = jnp.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]])
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    # near-zero fallback: I + skew(r)
    R0 = jnp.eye(3) + jnp.array([[0.0, -r[2], r[1]],
                                 [r[2], 0.0, -r[0]],
                                 [-r[1], r[0], 0.0]])
    return jnp.where(theta2 > 1e-12, R, R0)


def _se3_matrix(delta):
    """[6] (rx,ry,rz,tx,ty,tz) -> [4,4] rigid transform."""
    R = _so3_exp(delta[:3])
    m = jnp.eye(4)
    m = m.at[:3, :3].set(R)
    m = m.at[:3, 3].set(delta[3:])
    return m


def _perspective_raster_to_camera(fov_deg, width, height):
    """Differentiable rebuild of make_perspective's raster_to_camera for
    a traced fov (cameras/projective.py:56; reference transform.cpp
    Perspective)."""
    from pbrt_tpu.cameras.projective import _screen_window, _raster_to_screen
    from pbrt_tpu.core import transform as tfm
    screen = _screen_window(width, height)
    r2s = jnp.asarray(_raster_to_screen(width, height, screen).m,
                      jnp.float32)
    n, f = 1e-2, 1000.0
    inv_tan = 1.0 / jnp.tan(jnp.radians(fov_deg) / 2.0)
    persp = jnp.array([[1.0, 0, 0, 0],
                       [0, 1.0, 0, 0],
                       [0, 0, f / (f - n), -f * n / (f - n)],
                       [0, 0, 1.0, 0]])
    c2s = persp * jnp.array([[1.0], [1.0], [1.0], [1.0]])
    c2s = c2s.at[0, 0].set(inv_tan).at[1, 1].set(inv_tan)
    return jnp.linalg.inv(c2s) @ r2s


def apply_camera_params(camera, params, width, height):
    """Override camera leaves with optimization parameters (pose / fov)."""
    if "cam_delta" in params:
        D = _se3_matrix(params["cam_delta"])
        camera = camera.replace(cam_to_world=camera.cam_to_world @ D)
    if "cam_fov" in params:
        r2c = _perspective_raster_to_camera(params["cam_fov"],
                                            width, height)
        camera = camera.replace(raster_to_camera=r2c,
                                camera_to_raster=jnp.linalg.inv(r2c))
    return camera


# packed-table spectral slots (ir.MPK_SPECTRA order) that shadow the
# standalone mat_* arrays — gather_materials reads ONLY mat_packed, so
# differentiable overrides must be written into both
_PACKED_SLOT = {"mat_kd": 0, "mat_ks": 1, "mat_kr": 2, "mat_kt": 3}


def apply_params(scene, params):
    """Override scene leaves with optimization parameters (softplus-free:
    caller is responsible for positivity; see make_positive).

    Spectral material params are also spliced into the packed hi/lo
    material table (the one the one-hot gather actually reads); the
    bf16 hi + residual lo split keeps the gradient path intact (d(hi)/dv
    is identity through the downcast, d(lo)/dv = 0, summed = 1)."""
    scene = scene.replace(**params)
    pk = scene.mat_packed
    M = pk.shape[0] // 2
    NS = scene.mat_kd.shape[1]
    touched = False
    for name, s in _PACKED_SLOT.items():
        if name in params:
            v = jnp.broadcast_to(params[name], (M, NS)).astype(jnp.float32)
            hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            pk = pk.at[:M, s * NS:(s + 1) * NS].set(hi)
            pk = pk.at[M:, s * NS:(s + 1) * NS].set(v - hi)
            touched = True
    return scene.replace(mat_packed=pk) if touched else scene


def render_samples(params, scene, camera, W, H, cfg: SamplerConfig,
                   pixel_ids, sample_idx, max_depth=4, generate_rays=None):
    """Trace one sample per pixel id; returns L [B,31]."""
    from pbrt_tpu.cameras import projective
    if generate_rays is None:
        generate_rays = projective.generate_rays
    scene2 = apply_params(
        scene, {k: v for k, v in params.items()
                if k not in CAMERA_PARAM_KEYS})
    camera = apply_camera_params(camera, params, W, H)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx, generate_rays)
    L = pathmod.trace_paths(scene2, ray, pid, sidx, cfg,
                            max_depth=max_depth)
    return L * weight[:, None], pid


def render_loss(params, scene, camera, W, H, cfg, pixel_ids, sample_indices,
                target, max_depth=4):
    """MSE between estimated pixel spectra (averaged over the given sample
    indices) and target [n_pix, 31] spectra."""
    acc = 0.0
    for s in sample_indices:
        L, pid = render_samples(params, scene, camera, W, H, cfg,
                                pixel_ids, jnp.uint32(s),
                                max_depth=max_depth)
        acc = acc + L
    mean_L = acc / len(sample_indices)
    tgt = target[pixel_ids.astype(jnp.int32) % target.shape[0]]
    return jnp.mean((mean_L - tgt) ** 2)


def make_train_step(scene, camera, W, H, cfg, target, max_depth=4,
                    learning_rate=5e-2, optimizer=None):
    """Returns (init_opt_state, step_fn) for inverse rendering with optax."""
    import optax
    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    loss_grad = jax.value_and_grad(render_loss)

    # scene/camera/target as jit arguments: the axon tunnel re-uploads
    # captured constants on every dispatch
    @jax.jit
    def _step(scene, camera, target, params, opt_state, pixel_ids,
              sample_idx):
        loss, g = loss_grad(params, scene, camera, W, H, cfg, pixel_ids,
                            (sample_idx,), target, max_depth)
        updates, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {k: (v if k in CAMERA_PARAM_KEYS
                      else jnp.maximum(v, 0.0))
                  for k, v in params.items()}
        return params, opt_state, loss

    def step(params, opt_state, pixel_ids, sample_idx):
        return _step(scene, camera, target, params, opt_state,
                     pixel_ids, sample_idx)

    def init(params):
        return optimizer.init(params)

    return init, step


def finite_difference_grad(loss_fn, params, key_path, idx, eps=1e-3):
    """Central finite difference of a scalar loss w.r.t. one parameter
    entry — the BASELINE gradient-correctness harness."""
    import numpy as np

    def perturbed(delta):
        p = dict(params)
        arr = np.asarray(p[key_path]).copy()
        arr.flat[idx] += delta
        p[key_path] = jnp.asarray(arr)
        return float(loss_fn(p))

    return (perturbed(eps) - perturbed(-eps)) / (2 * eps)
