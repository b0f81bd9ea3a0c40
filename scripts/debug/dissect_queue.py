"""Queue-build cost breakdown on killeroo (TPU): scan slab pass vs
argsort vs gathers vs packing.  Usage: python scripts/dissect_queue.py"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.models import flagship
from pbrt_tpu.ops import pallas_intersect as pdense

job, cam_ctor = flagship.killeroo()
scene = jax.device_put(job.scene)
B = 1 << 17
RT = pdense.RAY_TILE
n_tiles = B // RT
rs = np.random.RandomState(0)
lo = np.asarray(scene.dense_cb[:, 0:3]).min(0) + np.asarray(scene.dense_center)
hi = np.asarray(scene.dense_cb[:, 4:7]).max(0) + np.asarray(scene.dense_center)
o = rs.rand(B, 3) * (hi - lo) + lo
d = rs.randn(B, 3)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
r16 = pdense.ray_vectors(jnp.asarray(o, jnp.float32),
                         jnp.asarray(d, jnp.float32), scene.dense_center)
r16t = jax.device_put(r16.reshape(n_tiles, RT, 16))
tmax_t = jax.device_put(jnp.full((n_tiles, RT), 1e30, jnp.float32))
cb = scene.dense_cb


def timed(fn, *a, n=12):
    jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


F32_MAX = pdense.F32_MAX


@jax.jit
def scan_only(r16_t, tmax_t, chunk_bounds):
    ray_ok = tmax_t > 0
    C = chunk_bounds.shape[0]
    CB = 16
    Cp = ((C + CB - 1) // CB) * CB
    cbp = jnp.pad(chunk_bounds, ((0, Cp - C), (0, 0)))
    oc = r16_t[..., 6:9]
    da = r16_t[..., 0:3]
    inv = 1.0 / jnp.where(jnp.abs(da) > 1e-20, da, 1e-20)

    def step(_, cb_blk):
        tnear = jnp.full(tmax_t.shape[:1] + (CB, tmax_t.shape[1]), -F32_MAX)
        tfar = jnp.full_like(tnear, F32_MAX)
        for ax in range(3):
            oca = oc[..., ax][:, None, :]
            inva = inv[..., ax][:, None, :]
            lo = cb_blk[None, :, ax, None]
            hi = cb_blk[None, :, 4 + ax, None]
            t0 = (lo - oca) * inva
            t1 = (hi - oca) * inva
            tnear = jnp.maximum(tnear, jnp.minimum(t0, t1))
            tfar = jnp.minimum(tfar, jnp.maximum(t0, t1))
        hit = (tnear <= tfar * 1.0001 + 1e-5) & (tfar > 0) \
            & (tnear < tmax_t[:, None, :]) & ray_ok[:, None, :]
        return None, (hit.any(-1),
                      jnp.min(jnp.where(hit, jnp.maximum(tnear, 0.0),
                                        F32_MAX), -1))

    _, (h, nr) = jax.lax.scan(step, None, cbp.reshape(Cp // CB, CB, 8))
    return h.sum(), nr.sum()


@jax.jit
def full_lists(r16_t, tmax_t, chunk_bounds):
    cl, na, nl = pdense._tile_chunk_lists(r16_t, tmax_t, chunk_bounds)
    return cl.sum(), na.sum(), nl.sum()


t_scan = timed(scan_only, r16t, tmax_t, cb)
t_full = timed(full_lists, r16t, tmax_t, cb)
print(f"tiles {n_tiles} chunks {cb.shape[0]}")
print(f"scan slab pass : {t_scan*1e3:7.2f} ms")
print(f"full queue     : {t_full*1e3:7.2f} ms  (sort+gather = "
      f"{(t_full-t_scan)*1e3:.2f} ms)")
