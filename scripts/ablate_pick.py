"""Split the loop kernel's per-group cost into DMA / dot / epilogue (TPU).

Same synthetic workload as micro_loop.py, fixed g groups per tile, but the
kernel body is swapped per mode:
  empty   : while_loop counts groups, nothing else (machinery + cond)
  dma     : + the PICK async copies and waits (trivial write)
  dot     : + the MXU dot, reduced with one cheap min (no epilogue)
  full    : the production body
Differences give each component.  Usage:
  python scripts/ablate_pick.py [n_tiles] [g]
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
LANE_MASK = pdense.LANE_MASK
LANE_BITS_CHUNK = pdense.LANE_BITS_CHUNK
F32_MAX = pdense.F32_MAX

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
G_FIX = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = N_TILES * RAY_TILE

o = rs.rand(B, 3).astype(np.float32) * 24 - 12
d = rs.randn(B, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
r16 = pdense.ray_vectors(jnp.asarray(o), jnp.asarray(d),
                         jnp.asarray(tab["center"]))
r16t = jax.device_put(r16.reshape(N_TILES, RAY_TILE, 16))
tmax2 = jax.device_put(jnp.full((N_TILES, 1, RAY_TILE), 1e30, jnp.float32))


def make_kernel(mode):
    def kern(cl_ref, na_ref, nl_ref, r16_ref, tmax_ref, w_hbm, cb_ref,
             t_ref, prim_ref, wbuf, sems):
        i = pl.program_id(0)
        ng = na_ref[i]
        r = r16_ref[0]
        r_hi = r.astype(jnp.bfloat16)
        r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r48 = jnp.concatenate([r_hi, r_lo, r_hi], axis=1)
        anyhit = r[:, 12][None, :] > 0.5

        def entry(j, s):
            idx = j * PICK + s
            word = cl_ref[idx >> 1, i]
            return jax.lax.select((idx & 1) == 0, word & 0xFFFF,
                                  (word >> 16) & 0xFFFF)

        PC = PICK * CHUNK

        def dma(slot, j, s, sec):
            c = entry(j, s)
            return pltpu.make_async_copy(
                w_hbm.at[sec, :, pl.ds(c * CHUNK, CHUNK)],
                wbuf.at[slot, :, pl.ds(sec * PC + s * CHUNK, CHUNK)],
                sems.at[slot, sec * PICK + s])

        def dma_all(slot, j):
            return [dma(slot, j, s, sec)
                    for sec in range(4) for s in range(PICK)]

        use_dma = mode in ("dma", "dot", "full")
        if use_dma:
            @pl.when(ng > 0)
            def _():
                for cp in dma_all(0, 0):
                    cp.start()

        BIG = jnp.int32(0x7F7FFFFF)
        dn = (((1,), (0,)), ((), ()))

        def body(state):
            j, t_best, prim = state
            if use_dma:
                @pl.when(j + 1 < ng)
                def _():
                    for cp in dma_all((j + 1) % 2, j + 1):
                        cp.start()
                for cp in dma_all(j % 2, j):
                    cp.wait()
            if mode == "empty":
                return (j + 1, t_best + 0.0, prim)
            if mode == "dma":
                probe = jnp.sum(wbuf[j % 2][0:1, 0:128].astype(jnp.float32))
                return (j + 1, t_best + 0.0 * probe, prim)
            out = jax.lax.dot_general(r48, wbuf[j % 2], dn,
                                      preferred_element_type=jnp.float32)
            if mode == "dot":
                return (j + 1,
                        jnp.minimum(t_best, jnp.min(out, 1)[None, :] + 1e30),
                        prim)
            s1 = out[:, 0 * PC:1 * PC]
            s2 = out[:, 1 * PC:2 * PC]
            num = out[:, 2 * PC:3 * PC]
            nd = out[:, 3 * PC:4 * PC]
            s0 = nd - s1 - s2
            i0 = s0.view(jnp.int32)
            i1 = s1.view(jnp.int32)
            i2 = s2.view(jnp.int32)
            inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
            t = num * pl.reciprocal(nd, approx=True)
            tb = jnp.where(t_best > 0, t_best, -F32_MAX)
            hit = inside & (t > 1e-4) & (t < tb[0][:, None])
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            key = (t.view(jnp.int32) & jnp.int32(~LANE_MASK)) | lane
            kmin = jnp.min(jnp.where(hit, key, BIG), axis=1)[None, :]
            upd = kmin < BIG
            t_new = (kmin & jnp.int32(~LANE_MASK)).view(jnp.float32)
            k = kmin & jnp.int32(LANE_MASK)
            t_new = jnp.where(anyhit, -1.0, t_new)
            s_win = k >> LANE_BITS_CHUNK
            c_win = jnp.full_like(k, entry(j, 0))
            for s in range(1, PICK):
                c_win = jnp.where(s_win == s, entry(j, s), c_win)
            return (j + 1,
                    jnp.where(upd, t_new, t_best),
                    jnp.where(upd, c_win * CHUNK + (k & (CHUNK - 1)), prim))

        def cond(state):
            j, t_best, _ = state
            return j < ng

        t_init = tmax_ref[0]
        prim_init = jnp.full(t_init.shape, -1, jnp.int32)
        j_end, t_best, prim = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_init, prim_init))
        t_ref[0] = t_best
        prim_ref[0] = prim
    return kern


def run_mode(mode, g, n=16):
    G = max(g, 1)
    CP = G * PICK + (G * PICK) % 2
    cl = rs.randint(0, C, size=(N_TILES, CP)).astype(np.int32)
    cl_packed = jnp.asarray((cl[:, 0::2] | (cl[:, 1::2] << 16)).T)
    ng = jnp.full((N_TILES,), g, jnp.int32)
    near = jnp.zeros((G, N_TILES), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec((1, RAY_TILE, 16), lambda i, cl_, na, nl: (i, 0, 0)),
            pl.BlockSpec((1, 1, RAY_TILE), lambda i, cl_, na, nl: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_TILE), lambda i, cl_, na, nl: (i, 0, 0)),
            pl.BlockSpec((1, 1, RAY_TILE), lambda i, cl_, na, nl: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 48, PICK * 4 * CHUNK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 4 * PICK)),
        ],
    )

    @jax.jit
    def go(cl_packed, ng, near, r16t, tmax2):
        return pl.pallas_call(
            make_kernel(mode),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((N_TILES, 1, RAY_TILE), jnp.float32),
                jax.ShapeDtypeStruct((N_TILES, 1, RAY_TILE), jnp.int32),
            ],
        )(cl_packed, ng, near, r16t, tmax2, W, cb)

    out = jax.block_until_ready(go(cl_packed, ng, near, r16t, tmax2))
    t0 = time.time()
    for _ in range(n):
        out = go(cl_packed, ng, near, r16t, tmax2)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


print(f"n_tiles={N_TILES} g={G_FIX} PICK={PICK} CHUNK={CHUNK} C={C}")
base = {}
for mode in ("empty", "dma", "dot", "full"):
    t1 = run_mode(mode, 1)
    tg = run_mode(mode, G_FIX)
    per_group = (tg - t1) / (G_FIX - 1) / N_TILES
    base[mode] = per_group
    print(f"{mode:6s}: g=1 {t1*1e3:7.3f} ms  g={G_FIX} {tg*1e3:8.3f} ms  "
          f"per-group {per_group*1e6:6.2f} us", flush=True)
print(f"components/group: machinery {base['empty']*1e6:.2f}  "
      f"dma +{(base['dma']-base['empty'])*1e6:.2f}  "
      f"dot +{(base['dot']-base['dma'])*1e6:.2f}  "
      f"epilogue +{(base['full']-base['dot'])*1e6:.2f} us")
