"""A/B: cheaper sort/gather/unsort pipelines for the dense path."""
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
lo = np.asarray(scene.world_lo); hi = np.asarray(scene.world_hi)
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
def key_sort_only(o, d, tmax):
    key = isect._coherence_key(scene, o, d, tmax)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    packed = jax.lax.sort((key << 18) | lane)
    return packed.sum()

@jax.jit
def keysort_rowgather(o, d, tmax):
    # precompute r16 w/ tmax in lane 13 -> single [B,16] row gather
    r16 = pdense.ray_vectors(o, d, scene.dense_center)
    r16 = r16.at[:, 13].set(tmax)
    key = isect._coherence_key(scene, o, d, tmax)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    packed = jax.lax.sort((key << 18) | lane)
    order = packed & ((1 << 18) - 1)
    r16s = r16[order]
    return r16s.sum()

@jax.jit
def scatter_unsort(o, d, tmax):
    # unsort two result arrays via scatter
    order = jnp.arange(B, dtype=jnp.int32)[::-1]
    t_s = o[:, 0]; prim_s = d[:, 0].astype(jnp.int32)
    t = jnp.zeros_like(t_s).at[order].set(t_s)
    prim = jnp.zeros_like(prim_s).at[order].set(prim_s)
    return t.sum() + prim.sum()

@jax.jit
def packed_unsort_sort(o, d, tmax):
    # single-array unsort: pack (lane, t_bits+prim?) can't pack 2x32 in i32.
    # sort 3 arrays (key, t, prim)
    order = jnp.arange(B, dtype=jnp.int32)[::-1]
    t_s = o[:, 0]; prim_s = d[:, 0].astype(jnp.int32)
    _, t, prim = jax.lax.sort((order, t_s, prim_s), num_keys=1)
    return t.sum() + prim.sum()

@jax.jit
def rv_1d(o, d, tmax):
    # ray_vectors computed as 1-D columns, single stack at the end
    ox, oy, oz = o[:, 0] - scene.dense_center[0], o[:, 1] - scene.dense_center[1], o[:, 2] - scene.dense_center[2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    ix = 1.0 / jnp.where(jnp.abs(dx) > 1e-20, dx, 1e-20)
    iy = 1.0 / jnp.where(jnp.abs(dy) > 1e-20, dy, 1e-20)
    iz = 1.0 / jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)
    z = jnp.zeros_like(dx); one = jnp.ones_like(dx)
    r16 = jnp.stack([dx, dy, dz, mx, my, mz, ox, oy, oz,
                     ix, iy, iz, z, tmax, z, one], -1)
    return r16.sum()

for name, fn in [("key-sort 1 arr", key_sort_only),
                 ("keysort+[B,16]gather", keysort_rowgather),
                 ("scatter unsort x2", scatter_unsort),
                 ("sort unsort x3", packed_unsort_sort),
                 ("rv via 1-D stack", rv_1d)]:
    print(f"{name:22s}: {timed(fn)*1e3:7.2f} ms", flush=True)
