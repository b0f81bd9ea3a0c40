"""Where does a bench one_pass spend time? intersect vs shadow vs shading.

Times bench-identical passes with pieces stubbed out (sync per iter,
varied sample_idx so the axon tunnel can't cache):
  full        - the real pass
  noshadow    - occluded() returns all-False (no shadow kernel)
  nohit       - intersect() returns a constant hit (no closest-hit kernel)
  neither     - both stubs
Also prints the mean active-chunk fraction per bounce for the real pass.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from unittest import mock

import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective
from pbrt_tpu.ops import intersect as isect

W = H = 256
SPP = 32
MAX_DEPTH = 5
scene, cam_ctor = flagship.cornell(tessellate=True)
camera = cam_ctor(W, H)
cfg = SamplerConfig(kind="sobol", seed=0, spp=SPP)
B = W * H

real_intersect = isect.intersect
real_occluded = isect.occluded


def fake_intersect(scene, ray, any_hit=False):
    B_ = ray.o.shape[0]
    t = jnp.full((B_,), 2.0)
    prim = jnp.zeros((B_,), jnp.int32)
    u = jnp.full((B_,), 0.3)
    v = jnp.full((B_,), 0.3)
    found = ray.tmax > 0
    return t, prim, u, v, found


def fake_occluded(scene, ray, ignore_light=None):
    return ray.tmax < -2.0  # all False, same shape


def make_pass(nohit, noshadow):
    ctx_i = mock.patch.object(isect, "intersect",
                              fake_intersect if nohit else real_intersect)
    ctx_o = mock.patch.object(isect, "occluded",
                              fake_occluded if noshadow else real_occluded)
    with ctx_i, ctx_o:
        @jax.jit
        def one_pass(sample_idx):
            pixel_ids = jnp.arange(B, dtype=jnp.uint32)
            ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
                camera, W, H, cfg, pixel_ids, sample_idx,
                projective.generate_rays)
            L = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=MAX_DEPTH)
            return jnp.sum(L * weight[:, None])
        one_pass(jnp.uint32(0)).block_until_ready()  # compile inside ctx
    return one_pass


def timeit(label, fn, iters=8):
    float(fn(jnp.uint32(0)))
    t0 = time.time()
    for s in range(1, iters + 1):
        float(fn(jnp.uint32(s)))
    dt = (time.time() - t0) / iters
    print(f"{label:10s}: {dt*1e3:7.1f} ms/pass", flush=True)


for label, nh, ns in [("full", False, False), ("noshadow", False, True),
                      ("nohit", True, False), ("neither", True, True)]:
    timeit(label, make_pass(nh, ns))

# active-chunk stats for camera rays
from pbrt_tpu.ops import pallas_intersect as pdense

@jax.jit
def active_frac(sample_idx):
    pixel_ids = jnp.arange(B, dtype=jnp.uint32)
    ray, *_ = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx, projective.generate_rays)
    r16 = pdense.ray_vectors(ray.o, ray.d, scene.dense_center)
    n_tiles = B // pdense.RAY_TILE
    r16_t = r16.reshape(n_tiles, pdense.RAY_TILE, 16)
    tmax_t = ray.tmax.reshape(n_tiles, pdense.RAY_TILE)
    cl, na = pdense._tile_chunk_lists(r16_t, tmax_t, scene.dense_cb)
    return na.sum(), na.max()

tot, mx = active_frac(jnp.uint32(0))
n_tiles = B // pdense.RAY_TILE
n_chunks = scene.dense_npad // pdense.CHUNK
print(f"camera rays: active {int(tot)}/{n_tiles*n_chunks} "
      f"({int(tot)/(n_tiles*n_chunks):.2%}), max/tile {int(mx)}/{n_chunks}")
