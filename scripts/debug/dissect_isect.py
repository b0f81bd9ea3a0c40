"""Cornell-scene intersect dissection (TPU).

Times, per 131k-ray trace_pair-shaped call:
  full trace      : sort + queue + kernel + MT refine + make-found
  presorted       : no coherence argsort
  queue-only      : _tile_chunk_lists + _work_queue (no kernel)
and reports the active (tile,chunk) pair count per call.
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

scene, cam_ctor = flagship.cornell(tessellate=True)
B = 131072
rs = np.random.RandomState(0)
o = rs.rand(B, 3) * 4.6 + 0.2
d = rs.randn(B, 3)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
ray = geom.Ray.make(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                    tmax=jnp.full((B,), 1e30, jnp.float32),
                    wavelength=jnp.full((B,), 550.0, jnp.float32))
print("chunks:", scene.dense_cb.shape[0], "n_pad:", scene.dense_npad,
      "tiles:", B // pdense.RAY_TILE)


def timed(fn, *a, n=8):
    jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


@jax.jit
def full(scene, ray):
    return isect._intersect_dense(scene, ray)


@jax.jit
def presorted(scene, ray):
    return isect._intersect_dense(scene, ray, presorted=True)


@jax.jit
def queue_only(scene, ray):
    o, dd = ray.o, ray.d
    t_init = ray.tmax.astype(jnp.float32)
    r16 = pdense.ray_vectors(o, dd, scene.dense_center)
    order = isect._coherence_order(scene, o, dd, t_init)
    r16 = r16[order]
    t_init = t_init[order]
    n_tiles = B // pdense.RAY_TILE
    r16t = r16.reshape(n_tiles, pdense.RAY_TILE, 16)
    tmax_t = t_init.reshape(n_tiles, pdense.RAY_TILE)
    cl, na, _ = pdense._tile_chunk_lists(r16t, tmax_t, scene.dense_cb)
    wt, wc, wf = pdense._work_queue(cl, na, n_tiles,
                                    scene.dense_npad // pdense.CHUNK)
    return wt.sum() + wc.sum() + wf.sum(), jnp.sum(na)


t_full = timed(full, scene, ray)
t_pre = timed(presorted, scene, ray)
t_q = timed(queue_only, scene, ray)
_, na = queue_only(scene, ray)
n_tiles = B // pdense.RAY_TILE
C = scene.dense_npad // pdense.CHUNK
print(f"full trace   : {t_full*1e3:7.2f} ms")
print(f"presorted    : {t_pre*1e3:7.2f} ms (sort+unsort delta "
      f"{(t_full-t_pre)*1e3:+.2f})")
print(f"queue only   : {t_q*1e3:7.2f} ms")
print(f"active pairs : {int(na)} of {n_tiles*C} "
      f"({int(na)/n_tiles:.2f} chunks/tile); kernel+refine ~ "
      f"{(t_pre-t_q)*1e3:.2f} ms -> {(t_pre-t_q)/max(int(na),1)*1e6:.1f} "
      f"us/step")
