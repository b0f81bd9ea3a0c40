"""Decompose the killeroo one_pass time (bench headline workload).

full(depth)  : real pass at max_depth 0/1/3/5 (marginal cost per bounce)
no-isect     : pass with intersect() stubbed to a constant hit
kernel 2B    : dense_intersect_loop alone, incoherent bounce-like batch
kernel cam   : same on a coherent camera batch
sort+queue   : _coherence_order + _tile_chunk_lists + _work_queue alone
steps        : sum(n_active) per launch (kernel inner-loop step count)
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.ops import pallas_intersect as pdense
from pbrt_tpu.core import geometry as geom

job, cam_ctor = flagship.killeroo()
scene = job.scene
W = H = 700
camera = cam_ctor(W, H)
cfg = SamplerConfig(kind="sobol", seed=0, spp=8)
B = 1 << 17
N_IT = 6
print("backend:", jax.default_backend(), " P(npad):", scene.dense_npad,
      " chunks:", scene.dense_cb.shape[0], flush=True)
scene = jax.device_put(scene)
camera = jax.device_put(camera)


def timed(fn, args_list):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.time()
    out = [fn(*a) for a in args_list[1:N_IT + 1]]
    jax.block_until_ready(out)
    return (time.time() - t0) / N_IT


def make_pass(max_depth):
    @jax.jit
    def one_pass(scene, camera, sample_idx):
        pixel_ids = jnp.arange(B, dtype=jnp.uint32)
        ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx,
            projective.generate_rays)
        L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                        max_depth=max_depth,
                                        count_rays=True)
        return jnp.sum(L * weight[:, None]), n_rays
    return one_pass

args_s = [(scene, camera, jnp.uint32(100 + s)) for s in range(N_IT + 2)]
prev = 0.0
for md in (0, 1, 3, 5):
    t = timed(make_pass(md), args_s)
    print(f"full depth={md} : {t*1e3:8.2f} ms  (marginal "
          f"{(t-prev)*1e3:+.2f})", flush=True)
    prev = t

real_intersect = isect.intersect

def fake_intersect(scene_, ray, any_hit=False, presorted=False,
                   anyhit_mask=None):
    B_ = ray.o.shape[0]
    t = jnp.full((B_,), 2.0)
    prim = jnp.zeros((B_,), jnp.int32)
    return t, prim, jnp.full((B_,), .3), jnp.full((B_,), .3), ray.tmax > 0

with mock.patch.object(isect, "intersect", fake_intersect):
    t_shade = timed(make_pass(5), args_s)
print(f"no-isect d=5  : {t_shade*1e3:8.2f} ms", flush=True)

# ---- kernel-only on bounce-like and camera batches -----------------------
lo = np.asarray(scene.world_lo)
hi = np.asarray(scene.world_hi)

def ray_batch(seed, n):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.where(rng.uniform(size=n) < 0.7, 1e30, -1.0).astype(np.float32)
    return (jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax))

batches = [ray_batch(s, 2 * B) for s in range(N_IT + 2)]

@jax.jit
def kernel_sorted(o, d, tmax):
    order = isect._coherence_order(scene, o, d, tmax)
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    t, prim = pdense.dense_intersect_loop(r16[order], tmax[order],
                                          scene.dense_w, scene.dense_cb,
                                          scene.dense_npad)
    return t.sum(), prim.sum()

t_k = timed(kernel_sorted, batches)
print(f"sort+kernel 2B: {t_k*1e3:8.2f} ms  (x6 launches/pass)", flush=True)

@jax.jit
def sortq_only(o, d, tmax):
    order = isect._coherence_order(scene, o, d, tmax)
    r16 = pdense.ray_vectors(o, d, scene.dense_center)[order]
    tm = tmax[order]
    n_tiles = (2 * B) // pdense.RAY_TILE
    r16t = r16.reshape(n_tiles, pdense.RAY_TILE, 16)
    tmt = tm.reshape(n_tiles, pdense.RAY_TILE)
    cl, na, nl = pdense._tile_chunk_lists(r16t, tmt, scene.dense_cb)
    return cl.sum() + na.sum(), nl.sum()

t_sq = timed(sortq_only, batches)
print(f"sort+queue 2B : {t_sq*1e3:8.2f} ms", flush=True)

# ---- step stats: real camera batch + incoherent bounce batch -------------
@jax.jit
def cam_stats(camera, sample_idx):
    pixel_ids = jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx, projective.generate_rays)
    r16 = pdense.ray_vectors(ray.o, ray.d, scene.dense_center)
    n_tiles = B // pdense.RAY_TILE
    r16t = r16.reshape(n_tiles, pdense.RAY_TILE, 16)
    tmt = ray.tmax.reshape(n_tiles, pdense.RAY_TILE)
    cl, na, nl = pdense._tile_chunk_lists(r16t, tmt, scene.dense_cb)
    return na

na_cam = np.asarray(cam_stats(camera, jnp.uint32(3)))
print(f"camera batch: active chunks/tile mean {na_cam.mean():.2f} "
      f"max {na_cam.max()} of {scene.dense_cb.shape[0]} "
      f"({na_cam.sum()} steps, {B // pdense.RAY_TILE} tiles)", flush=True)

@jax.jit
def bounce_stats(o, d, tmax):
    order = isect._coherence_order(scene, o, d, tmax)
    r16 = pdense.ray_vectors(o, d, scene.dense_center)[order]
    tm = tmax[order]
    n_tiles = (2 * B) // pdense.RAY_TILE
    r16t = r16.reshape(n_tiles, pdense.RAY_TILE, 16)
    tmt = tm.reshape(n_tiles, pdense.RAY_TILE)
    cl, na, nl = pdense._tile_chunk_lists(r16t, tmt, scene.dense_cb)
    return na

na_b = np.asarray(bounce_stats(*batches[0]))
print(f"bounce batch: active chunks/tile mean {na_b.mean():.2f} "
      f"max {na_b.max()} ({na_b.sum()} steps, "
      f"{2 * B // pdense.RAY_TILE} tiles)", flush=True)
