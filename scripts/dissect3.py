"""Decompose current bench one_pass time (trace_pair era).

Pieces timed on the TPU with varied inputs per call (axon tunnel caches
identical executions):
  full       : real one_pass
  shading    : one_pass with intersect() stubbed to a constant hit
  kernel     : dense_intersect alone on a bounce-like 2B ray batch
  queue      : _tile_chunk_lists + _work_queue alone (same batch)
  sort       : _coherence_order + gather alone
  makehit    : make_hit alone on kernel outputs
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

W = H = 256
SPP = 32
MAX_DEPTH = 5
scene, cam_ctor = flagship.cornell(tessellate=True)
camera = cam_ctor(W, H)
cfg = SamplerConfig(kind="sobol", seed=0, spp=SPP)
B = W * H
N_IT = 8

print("backend:", jax.default_backend(), " P(npad):", scene.dense_npad,
      " chunks:", scene.dense_cb.shape[0], flush=True)


def timed(fn, args_list):
    jax.block_until_ready(fn(*args_list[0]))
    t0 = time.time()
    out = [fn(*a) for a in args_list[1:N_IT + 1]]
    jax.block_until_ready(out)
    return (time.time() - t0) / N_IT


@jax.jit
def one_pass(sample_idx):
    pixel_ids = jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx, projective.generate_rays)
    L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=MAX_DEPTH, count_rays=True)
    return jnp.sum(L * weight[:, None]), n_rays

args_s = [(jnp.uint32(100 + s),) for s in range(N_IT + 2)]
t_full = timed(one_pass, args_s)
print(f"full pass      : {t_full*1e3:8.2f} ms", flush=True)

# ---- shading-only: intersect stubbed -------------------------------------
real_intersect = isect.intersect

def fake_intersect(scene_, ray, any_hit=False, presorted=False,
                   anyhit_mask=None):
    B_ = ray.o.shape[0]
    t = jnp.full((B_,), 2.0)
    prim = jnp.zeros((B_,), jnp.int32)
    return t, prim, jnp.full((B_,), .3), jnp.full((B_,), .3), ray.tmax > 0

with mock.patch.object(isect, "intersect", fake_intersect):
    @jax.jit
    def one_pass_noisect(sample_idx):
        pixel_ids = jnp.arange(B, dtype=jnp.uint32)
        ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
            camera, W, H, cfg, pixel_ids, sample_idx,
            projective.generate_rays)
        L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                        max_depth=MAX_DEPTH,
                                        count_rays=True)
        return jnp.sum(L * weight[:, None]), n_rays
    t_shade = timed(one_pass_noisect, args_s)
print(f"shading only   : {t_shade*1e3:8.2f} ms  (pass minus all intersect)",
      flush=True)

# ---- bounce-like ray batches (2B combined closest+shadow) ----------------
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
def kernel_only(o, d, tmax):
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    t, prim = pdense.dense_intersect(r16, tmax, scene.dense_w,
                                     scene.dense_cb, scene.dense_npad)
    return t.sum(), prim.sum()

t_kernel = timed(kernel_only, batches)
print(f"dense kernel   : {t_kernel*1e3:8.2f} ms  (2B incoherent rays, "
      f"x{MAX_DEPTH} bounces/pass)", flush=True)

@jax.jit
def sorted_kernel(o, d, tmax):
    order = isect._coherence_order(scene, o, d, tmax)
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    t, prim = pdense.dense_intersect(r16[order], tmax[order], scene.dense_w,
                                     scene.dense_cb, scene.dense_npad)
    return t.sum(), prim.sum()

t_skernel = timed(sorted_kernel, batches)
print(f"sort + kernel  : {t_skernel*1e3:8.2f} ms", flush=True)

@jax.jit
def sort_only(o, d, tmax):
    order = isect._coherence_order(scene, o, d, tmax)
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    return r16[order].sum(), tmax[order].sum()

t_sort = timed(sort_only, batches)
print(f"sort only      : {t_sort*1e3:8.2f} ms", flush=True)

RT = pdense.RAY_TILE

@jax.jit
def queue_only(o, d, tmax):
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    n_tiles = (2 * B) // RT
    r16t = r16.reshape(n_tiles, RT, 16)
    tmt = tmax.reshape(n_tiles, RT)
    cl, na, _ = pdense._tile_chunk_lists(r16t, tmt, scene.dense_cb)
    wt, wc, wf = pdense._work_queue(cl, na, n_tiles,
                                    scene.dense_npad // pdense.CHUNK)
    return wt.sum() + wc.sum() + wf.sum(), na.sum()

t_queue = timed(queue_only, batches)
print(f"queue build    : {t_queue*1e3:8.2f} ms", flush=True)

@jax.jit
def makehit_only(o, d, tmax):
    ray = geom.Ray.make(o, d, tmax=tmax)
    t = jnp.full((2 * B,), 2.0)
    prim = (jnp.arange(2 * B, dtype=jnp.int32) * 7) % scene.prim_type.shape[0]
    hit = isect.make_hit(scene, ray, t, prim, jnp.full((2 * B,), .3),
                         jnp.full((2 * B,), .3), tmax > 0)
    return hit.p.sum() + hit.ns.sum() + hit.uv.sum()

t_mh = timed(makehit_only, batches)
print(f"make_hit       : {t_mh*1e3:8.2f} ms", flush=True)

# active-chunk stats for a bounce-like batch
o, d, tmax = batches[0]
r16 = pdense.ray_vectors(o, d, scene.dense_center)
n_tiles = (2 * B) // RT
cl, na, _ = pdense._tile_chunk_lists(r16.reshape(n_tiles, RT, 16),
                                  tmax.reshape(n_tiles, RT), scene.dense_cb)
na = np.asarray(na)
print(f"active chunks/tile: mean {na.mean():.2f} of "
      f"{scene.dense_npad // pdense.CHUNK}", flush=True)
