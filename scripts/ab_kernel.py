"""A/B the work-queue grid kernel vs the chunk-loop kernel (TPU).

Checks agreement on cornell-like rays, then times both on camera-like
(coherent) and bounce-like (sorted-incoherent) batches.
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
o = jnp.asarray(o, jnp.float32)
d = jnp.asarray(d, jnp.float32)
tmax = jnp.full((B,), 1e30, jnp.float32)

r16 = pdense.ray_vectors(o, d, scene.dense_center)
order = isect._coherence_order(scene, o, d, tmax)
r16s = r16[order]
tmaxs = tmax[order]


@jax.jit
def v1(r16, tmax):
    return pdense.dense_intersect(r16, tmax, scene.dense_w, scene.dense_cb,
                                  scene.dense_npad)


@jax.jit
def v2(r16, tmax):
    return pdense.dense_intersect_loop(r16, tmax, scene.dense_w,
                                       scene.dense_cb, scene.dense_npad)


def timed(fn, *a, n=16):
    jax.block_until_ready(fn(*a))
    t0 = time.time()
    out = [fn(*a) for _ in range(n)]
    jax.block_until_ready(out)
    return (time.time() - t0) / n


t1, p1 = jax.device_get(v1(r16s, tmaxs))
t2, p2 = jax.device_get(v2(r16s, tmaxs))
agree_p = float((p1 == p2).mean())
mask = (p1 == p2) & (p1 >= 0)
dt = np.abs(t1[mask] - t2[mask]) / np.maximum(np.abs(t1[mask]), 1e-6)
print(f"prim agree: {agree_p*100:.3f}%   t relerr max: {dt.max():.2e}")

d1 = timed(v1, r16s, tmaxs)
d2 = timed(v2, r16s, tmaxs)
print(f"sorted-incoherent {B} rays:  v1 {d1*1e3:7.2f} ms  "
      f"v2 {d2*1e3:7.2f} ms  ({d1/d2:.2f}x)")
print(f"  v1 {B/d1/1e6:7.1f} M rays/s   v2 {B/d2/1e6:7.1f} M rays/s")
