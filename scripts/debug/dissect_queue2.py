"""Decompose sort+queue cost on killeroo bounce batches (round 4)."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from pbrt_tpu.models import flagship
from pbrt_tpu.ops import intersect as isect
from pbrt_tpu.ops import pallas_intersect as pdense

job, _ = flagship.killeroo()
scene = jax.device_put(job.scene)
B = 1 << 18
T = pdense.RAY_TILE
n_tiles = B // T
lo = np.asarray(scene.world_lo); hi = np.asarray(scene.world_hi)
rng = np.random.default_rng(0)
def batch(seed):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.where(rng.uniform(size=B) < 0.7, 1e30, -1.0).astype(np.float32)
    return (jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax))
batches = [batch(s) for s in range(8)]

def timed(fn, n=6):
    jax.block_until_ready(fn(*batches[0]))
    t0 = time.time()
    out = [fn(*batches[1 + i % 7]) for i in range(n)]
    jax.block_until_ready(out)
    return (time.time() - t0) / n

@jax.jit
def sort_only(o, d, tmax):
    key = isect._coherence_key(scene, o, d, tmax)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    packed, o0, o1, o2, d0, d1, d2, ts = jax.lax.sort(
        ((key << 18) | lane, o[:, 0], o[:, 1], o[:, 2],
         d[:, 0], d[:, 1], d[:, 2], tmax), num_keys=1)
    return packed.sum() + ts.sum() + o0.sum() + d0.sum() + o1.sum() + o2.sum() + d1.sum() + d2.sum()

@jax.jit
def unsort_only(o, d, tmax):
    lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    _, t2, p2 = jax.lax.sort((lane[::-1], tmax, lane), num_keys=1)
    return t2.sum() + p2.sum()

@jax.jit
def rv_only(o, d, tmax):
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    return r16.sum()

@jax.jit
def queue_pallas(o, d, tmax):
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    r16t = r16.reshape(n_tiles, T, 16)
    tmt = tmax.reshape(n_tiles, T)
    # just the pallas slab kernel part: replicate _tile_chunk_lists up to hits/nears
    cb = scene.dense_cb
    C = cb.shape[0]
    Cp = ((C + 7) // 8) * 8
    cbp = jnp.pad(cb, ((0, Cp - C), (0, 0)))
    tmax2 = tmt.reshape(n_tiles, 1, T)
    from jax.experimental import pallas as pl
    tq = max(1, min(pdense.TPG, n_tiles))
    nt_p = ((n_tiles + tq - 1) // tq) * tq
    hits_f, nears = pl.pallas_call(
        pdense._queue_kernel,
        grid=(nt_p // tq,),
        in_specs=[
            pl.BlockSpec((tq, T, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((tq, 1, T), lambda i: (i, 0, 0)),
            pl.BlockSpec((Cp, 8), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tq, 1, Cp), lambda i: (i, 0, 0)),
            pl.BlockSpec((tq, 1, Cp), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt_p, 1, Cp), jnp.float32),
            jax.ShapeDtypeStruct((nt_p, 1, Cp), jnp.float32),
        ],
    )(r16t, tmax2, cbp)
    return hits_f.sum() + nears.sum()

@jax.jit
def queue_full(o, d, tmax):
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    r16t = r16.reshape(n_tiles, T, 16)
    tmt = tmax.reshape(n_tiles, T)
    cl, na, nl = pdense._tile_chunk_lists(r16t, tmt, scene.dense_cb)
    return cl.sum() + na.sum() + nl.sum()

@jax.jit
def kernel_presorted(o, d, tmax):
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    t, prim = pdense.dense_intersect_loop(r16, tmax, scene.dense_w,
                                          scene.dense_cb, scene.dense_npad)
    return t.sum() + prim.sum()

for name, fn in [("ray_vectors", rv_only), ("sort9", sort_only),
                 ("unsort3", unsort_only),
                 ("queue pallas slab", queue_pallas),
                 ("queue full (+argsort)", queue_full),
                 ("kernel+queue presorted", kernel_presorted)]:
    print(f"{name:24s}: {timed(fn)*1e3:7.2f} ms", flush=True)
