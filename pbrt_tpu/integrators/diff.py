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
    scene2 = apply_params(scene, params)
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
        params = jax.tree.map(lambda x: jnp.maximum(x, 0.0), params)
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
