"""Kernel-only closest-hit microbench on a killeroo-class mesh.

Loads the killeroo scene geometry through the parser, shoots camera-ray
batches (varied per iter to defeat the axon tunnel cache), times
dense_intersect alone.
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.ops import pallas_intersect as pdense

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 0

# synth "killeroo-class": 66k tris clustered into blobs (mimics BVH-leaf
# locality: tris sorted along a space-filling order)
rs = np.random.RandomState(SEED)
n = 66000
# Morton-ish ordering: sort cluster centers along a curve for leaf locality
ncl = 256
centers = rs.rand(ncl, 3) * 20 - 10
order = np.argsort(centers[:, 0] + 37.1 * np.floor(centers[:, 1]) )
centers = centers[order]
per = n // ncl
base = np.repeat(centers, per, 0) + rs.randn(ncl * per, 3) * 0.3
v0 = base
e1 = rs.randn(ncl * per, 3) * 0.1
e2 = rs.randn(ncl * per, 3) * 0.1
n = v0.shape[0]
tab = pdense.build_dense_tables(v0, e1, e2)
print("P =", n, "chunks =", tab["n_pad"] // pdense.CHUNK)

B = 65536
W = jnp.asarray(tab["W"])
cb = jnp.asarray(tab["chunk_bounds"])
center = jnp.asarray(tab["center"])


@jax.jit
def shoot(seed):
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    # coherent camera-style: origin plane, directions toward scene
    px = jax.random.uniform(k1, (B, 2)) * 24 - 12
    o = jnp.concatenate([px[:, :1], px[:, 1:], jnp.full((B, 1), -40.0)], 1)
    tgt = jnp.concatenate([px * 0.8, jnp.zeros((B, 1))], 1)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r16 = pdense.ray_vectors(o, d, center)
    tmax = jnp.full((B,), 1e30, jnp.float32)
    t, prim = pdense.dense_intersect_loop(r16, tmax, W, cb, tab["n_pad"])
    return t.sum(), (prim >= 0).mean()


s, h = shoot(0)
s.block_until_ready()
print("hit rate:", float(h))
ITERS = 20
t0 = time.time()
for i in range(1, ITERS + 1):
    s, h = shoot(i)
s.block_until_ready()
dt = time.time() - t0
print(f"{B*ITERS/dt/1e6:.3f} M closest-hit rays/s   ({dt/ITERS*1e3:.1f} ms/batch)")
