"""Controlled microbench of the chunk-loop kernel (TPU).

Feeds the pallas kernel synthetic chunk lists with exactly G groups per
tile so fixed-per-tile vs per-group costs separate cleanly.
Usage: python scripts/micro_loop.py [n_tiles]
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pbrt_tpu.ops import pallas_intersect as pdense

RAY_TILE = pdense.RAY_TILE
CHUNK = pdense.CHUNK
PICK = pdense.PICK

# killeroo-class synthetic mesh (66k tris, leaf-local clusters)
rs = np.random.RandomState(0)
ncl = 256
centers = rs.rand(ncl, 3) * 20 - 10
order = np.argsort(centers[:, 0] + 37.1 * np.floor(centers[:, 1]))
centers = centers[order]
per = 66000 // ncl
base = np.repeat(centers, per, 0) + rs.randn(ncl * per, 3) * 0.3
v0, e1, e2 = base, rs.randn(ncl * per, 3) * 0.1, rs.randn(ncl * per, 3) * 0.1
tab = pdense.build_dense_tables(v0, e1, e2)
W = jax.device_put(jnp.asarray(tab["W"]))
cb = jax.device_put(jnp.asarray(tab["chunk_bounds"]))
n_pad = tab["n_pad"]
C = n_pad // CHUNK
N_TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = N_TILES * RAY_TILE

o = rs.rand(B, 3).astype(np.float32) * 24 - 12
d = rs.randn(B, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
r16 = pdense.ray_vectors(jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(tab["center"]))
r_hi = r16.astype(jnp.bfloat16)
r_lo = (r16 - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
r48t = jax.device_put(jnp.concatenate([r_hi, r_lo, r_hi], -1)
                      .reshape(N_TILES, RAY_TILE, 48))
tmax_t = jnp.full((N_TILES, RAY_TILE), 1e30, jnp.float32)
meta = jax.device_put(jnp.stack(
    [tmax_t, r16.reshape(N_TILES, RAY_TILE, 16)[:, :, 12]], 1))
TPG = pdense.TPG


def run_g(g, n=16):
    """Time the kernel with exactly g groups per tile."""
    G = max(g, 1)
    CP = G * PICK + (G * PICK) % 2
    cl = rs.randint(0, C, size=(N_TILES, CP)).astype(np.int32)
    cl_packed = jnp.asarray((cl[:, 0::2] | (cl[:, 1::2] << 16)).T)
    ng = jnp.full((N_TILES,), g, jnp.int32)
    near = jnp.zeros((G, N_TILES), jnp.float32)   # never early-exits
    resident = (np.asarray(W).size * 2) <= pdense.VMEM_RESIDENT_BYTES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N_TILES // TPG,),
        in_specs=[
            pl.BlockSpec((TPG, RAY_TILE, 48),
                         lambda i, cl_, na, nl: (i, 0, 0)),
            pl.BlockSpec((TPG, 2, RAY_TILE),
                         lambda i, cl_, na, nl: (i, 0, 0)),
            pl.BlockSpec(memory_space=(pltpu.VMEM if resident
                                       else pltpu.ANY)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TPG, 1, RAY_TILE),
                         lambda i, cl_, na, nl: (i, 0, 0)),
            pl.BlockSpec((TPG, 1, RAY_TILE),
                         lambda i, cl_, na, nl: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 48, PICK * 4 * CHUNK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 4 * PICK)),
        ],
    )

    @jax.jit
    def go(cl_packed, ng, near, r48t, meta):
        return pl.pallas_call(
            partial(pdense._kernel_loop, resident=resident),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((N_TILES, 1, RAY_TILE), jnp.float32),
                jax.ShapeDtypeStruct((N_TILES, 1, RAY_TILE), jnp.int32),
            ],
        )(cl_packed, ng, near, r48t, meta, W, cb)

    out = jax.block_until_ready(go(cl_packed, ng, near, r48t, meta))
    t0 = time.time()
    for _ in range(n):
        out = go(cl_packed, ng, near, r48t, meta)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


print(f"n_tiles={N_TILES} PICK={PICK} CHUNK={CHUNK} C={C} "
      f"resident={(np.asarray(W).size*2) <= pdense.VMEM_RESIDENT_BYTES}")
ts = {}
for g in [0, 1, 2, 4, 8, 16]:
    ts[g] = run_g(g)
    per_tile = ts[g] / N_TILES
    print(f"g={g:3d}: {ts[g]*1e3:8.3f} ms  {per_tile*1e6:7.2f} us/tile",
          flush=True)
v = (ts[16] - ts[4]) / 12 / N_TILES
f = ts[1] / N_TILES - v
lanes = RAY_TILE * PICK * CHUNK
print(f"per-group: {v*1e6:.2f} us  fixed(+1g): {f*1e6:.2f} us  "
      f"empty: {ts[0]/N_TILES*1e6:.2f} us/tile")
print(f"lane-tests/s at g-slope: {lanes / v / 1e9:.1f} G/s")
