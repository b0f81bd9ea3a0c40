"""Killeroo perf dissection (TPU): where do the 450ns/ray go?

Times, for bench-shaped ray batches on the killeroo scene:
  - full pass (trace_paths)                 : the bench workload
  - per-bounce intersect (camera-coherent)  : presorted dense trace
  - per-bounce intersect (incoherent)       : sorted dense trace
  - queue build only / sort only
  - raw kernel (no queue, no sort)
and reports active chunk-groups per tile (the loop-kernel work metric).
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.core import geometry as geom
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.ops import pallas_intersect as pdense
from pbrt_tpu.integrators import path as pathmod
from pbrt_tpu.samplers.samplers import SamplerConfig
from pbrt_tpu.cameras import projective

job, cam_ctor = flagship.killeroo()
scene = jax.device_put(job.scene)
W = H = 700
camera = jax.device_put(cam_ctor(W, H))
cfg = SamplerConfig(kind="sobol", seed=0, spp=8)
MAX_DEPTH = int(job.integrator_params.get("maxdepth", 5))
B = 1 << 17
n_tiles = B // pdense.RAY_TILE
C = scene.dense_npad // pdense.CHUNK
print(f"tris(pad): {scene.dense_npad}  chunks: {C}  PICK: {pdense.PICK} "
      f"CHUNK: {pdense.CHUNK}  tiles: {n_tiles}", flush=True)


def timed(fn, *a, n=6):
    jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


# ---- full pass -----------------------------------------------------------
@jax.jit
def one_pass(scene, camera, pixel0, sample_idx):
    pixel_ids = pixel0 + jnp.arange(B, dtype=jnp.uint32)
    ray, weight, pfilm, pid, sidx = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, sample_idx, projective.generate_rays)
    L, n_rays = pathmod.trace_paths(scene, ray, pid, sidx, cfg,
                                    max_depth=MAX_DEPTH, count_rays=True)
    return jnp.sum(L * weight[:, None]), n_rays


t_pass = timed(one_pass, scene, camera, jnp.uint32(0), jnp.uint32(5))
_, nr = one_pass(scene, camera, jnp.uint32(0), jnp.uint32(5))
print(f"full pass    : {t_pass*1e3:7.2f} ms  n_rays={float(nr):.0f} "
      f"-> {float(nr)/t_pass/1e6:.2f}M rays/s", flush=True)

# ---- ray batches ---------------------------------------------------------
@jax.jit
def cam_rays(scene, camera):
    pixel_ids = jnp.arange(B, dtype=jnp.uint32)
    ray, *_ = pathmod.camera_rays_for_pixels(
        camera, W, H, cfg, pixel_ids, jnp.uint32(3),
        projective.generate_rays)
    return ray

ray_cam = jax.block_until_ready(cam_rays(scene, camera))

# incoherent bounce-like rays: origins on scene geometry, random dirs
rs = np.random.RandomState(0)
lo = np.asarray(scene.dense_cb[:, 0:3]).min(0) + np.asarray(scene.dense_center)
hi = np.asarray(scene.dense_cb[:, 4:7]).max(0) + np.asarray(scene.dense_center)
o = rs.rand(B, 3) * (hi - lo) + lo
d = rs.randn(B, 3)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
ray_inc = geom.Ray.make(jnp.asarray(o, jnp.float32),
                        jnp.asarray(d, jnp.float32),
                        tmax=jnp.full((B,), 1e30, jnp.float32),
                        wavelength=jnp.full((B,), 550.0, jnp.float32))


@jax.jit
def isect_pre(scene, ray):
    return isect._intersect_dense(scene, ray, presorted=True)


@jax.jit
def isect_sorted(scene, ray):
    return isect._intersect_dense(scene, ray)


@jax.jit
def queue_only(scene, ray):
    o, dd = ray.o, ray.d
    t_init = ray.tmax.astype(jnp.float32)
    r16 = pdense.ray_vectors(o, dd, scene.dense_center)
    r16t = r16.reshape(n_tiles, pdense.RAY_TILE, 16)
    tmax_t = t_init.reshape(n_tiles, pdense.RAY_TILE)
    cl, na, nl = pdense._tile_chunk_lists(r16t, tmax_t, scene.dense_cb)
    return cl.sum() + na.sum(), na


@jax.jit
def sort_only(scene, ray):
    o, dd = ray.o, ray.d
    t_init = ray.tmax.astype(jnp.float32)
    key = isect._coherence_key(scene, o, dd, t_init)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    packed, o0, o1, o2, d0, d1, d2, ts = jax.lax.sort(
        ((key << 18) | lane, o[:, 0], o[:, 1], o[:, 2],
         dd[:, 0], dd[:, 1], dd[:, 2], t_init), num_keys=1)
    return packed.sum() + ts.sum()


for name, rb in [("camera", ray_cam), ("incoher", ray_inc)]:
    t_pre = timed(isect_pre, scene, rb)
    t_sort = timed(isect_sorted, scene, rb)
    t_q = timed(queue_only, scene, rb)
    t_s = timed(sort_only, scene, rb)
    _, na = queue_only(scene, rb)
    na = np.asarray(na)
    print(f"[{name}] presorted: {t_pre*1e3:6.2f} ms  sorted: "
          f"{t_sort*1e3:6.2f} ms  queue: {t_q*1e3:6.2f} ms  sort: "
          f"{t_s*1e3:6.2f} ms", flush=True)
    print(f"[{name}] active chunks/tile: mean {na.mean():.1f}  "
          f"p50 {np.percentile(na, 50):.0f}  p90 "
          f"{np.percentile(na, 90):.0f}  max {na.max()}  "
          f"groups/tile(PICK={pdense.PICK}): "
          f"{(np.ceil(na / pdense.PICK)).mean():.1f}", flush=True)
    # kernel-only estimate
    per_step = (t_pre - t_q) / max(np.ceil(na / pdense.PICK).sum(), 1)
    print(f"[{name}] kernel-queue delta: {(t_pre-t_q)*1e3:.2f} ms -> "
          f"{per_step*1e6:.2f} us/group-step", flush=True)
