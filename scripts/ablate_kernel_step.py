"""Per-step cost ablation of the dense kernel (TPU, synth 66k tris).

Variants (same grid/queue machinery):
  full      : current kernel
  dot-only  : MXU dot + trivial write (no epilogue)
  no-dot    : box test + trivial write (machinery floor)
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

CHUNK = pdense.CHUNK
RAY_TILE = pdense.RAY_TILE
F32_MAX = pdense.F32_MAX

rs = np.random.RandomState(0)
n = 66000
ncl = 256
centers = rs.rand(ncl, 3) * 20 - 10
order = np.argsort(centers[:, 0] + 37.1 * np.floor(centers[:, 1]))
centers = centers[order]
per = n // ncl
base = np.repeat(centers, per, 0) + rs.randn(ncl * per, 3) * 0.3
v0, e1, e2 = base, rs.randn(ncl * per, 3) * 0.1, rs.randn(ncl * per, 3) * 0.1
tab = pdense.build_dense_tables(v0, e1, e2)
Wt = jnp.asarray(tab["W"])
cb = jnp.asarray(tab["chunk_bounds"])
center = jnp.asarray(tab["center"])
n_pad = tab["n_pad"]

B = 65536


def make_kernel(mode):
    def _kernel(wq_tile_ref, wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref,
                w_ref, cb_ref, t_ref, prim_ref):
        k = pl.program_id(0)
        c = wq_chunk_ref[k]
        flag = wq_flag_ref[k]

        @pl.when(flag == 2)
        def _():
            t_ref[:] = tmax_ref[:]
            prim_ref[:] = jnp.full_like(prim_ref, -1)

        r = r16_ref[0]
        t_best = t_ref[0, 0]
        oc = r[:, 6:9]
        inv_d = r[:, 9:12]
        lo = cb_ref[c, 0:3]
        hi = cb_ref[c, 4:7]
        t0 = (lo[None, :] - oc) * inv_d
        t1 = (hi[None, :] - oc) * inv_d
        tnear = jnp.max(jnp.minimum(t0, t1), axis=1)
        tfar = jnp.min(jnp.maximum(t0, t1), axis=1)
        box_hit = (tnear <= tfar * 1.0001 + 1e-5) & (tnear < t_best) & \
                  (tfar > 0) & (t_best > 0)

        @pl.when((flag > 0) & jnp.any(box_hit))
        def _():
            if mode == "nodot":
                t_ref[0, 0, :] = t_best * 0.9999
                return
            r_hi = r.astype(jnp.bfloat16)
            r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            r48 = jnp.concatenate([r_hi, r_lo, r_hi], axis=1)
            dn = (((1,), (0,)), ((), ()))
            out = jax.lax.dot_general(r48, w_ref[:], dn,
                                      preferred_element_type=jnp.float32)
            if mode == "dotonly":
                t_ref[0, 0, :] = jnp.minimum(t_best, out[:, 0])
                return
            s1 = out[:, 0 * CHUNK:1 * CHUNK]
            s2 = out[:, 1 * CHUNK:2 * CHUNK]
            num = out[:, 2 * CHUNK:3 * CHUNK]
            nd = out[:, 3 * CHUNK:4 * CHUNK]
            s0 = nd - s1 - s2
            i0 = s0.view(jnp.int32)
            i1 = s1.view(jnp.int32)
            i2 = s2.view(jnp.int32)
            inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
            t = num * pl.reciprocal(nd, approx=True)
            tb = jnp.where(box_hit, t_best, -F32_MAX)
            hit = inside & (t > 1e-4) & (t < tb[:, None])
            LM = jnp.int32(CHUNK - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            key = (t.view(jnp.int32) & ~LM) | lane
            BIG = jnp.int32(0x7F7FFFFF)
            kmin = jnp.min(jnp.where(hit, key, BIG), axis=1)
            upd = kmin < BIG
            t_new = (kmin & ~LM).view(jnp.float32)
            kk = kmin & LM
            t_ref[0, 0, :] = jnp.where(upd, t_new, t_best)
            prim_ref[0, 0, :] = jnp.where(upd, c * CHUNK + kk,
                                          prim_ref[0, 0, :])
    return _kernel


@partial(jax.jit, static_argnames=("mode",))
def run(r16, tmax, mode):
    Bp = B
    n_tiles = Bp // RAY_TILE
    n_chunks = n_pad // CHUNK
    r16t = r16.reshape(n_tiles, RAY_TILE, 16)
    tmax_t = tmax.reshape(n_tiles, RAY_TILE)
    tmax2 = tmax.reshape(n_tiles, 1, RAY_TILE)
    chunk_list, n_active, _ = pdense._tile_chunk_lists(r16t, tmax_t, cb)
    wq_tile, wq_chunk, wq_flag = pdense._work_queue(
        chunk_list, n_active, n_tiles, n_chunks)
    cap = n_tiles * n_chunks
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, RAY_TILE, 16),
                         lambda k, wt, wc, wf: (wt[k], 0, 0)),
            pl.BlockSpec((1, 1, RAY_TILE),
                         lambda k, wt, wc, wf: (wt[k], 0, 0)),
            pl.BlockSpec((48, 4 * CHUNK),
                         lambda k, wt, wc, wf: (0, wc[k])),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RAY_TILE),
                         lambda k, wt, wc, wf: (wt[k], 0, 0)),
            pl.BlockSpec((1, 1, RAY_TILE),
                         lambda k, wt, wc, wf: (wt[k], 0, 0)),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        make_kernel(mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.int32),
        ],
    )(wq_tile[:cap], wq_chunk[:cap], wq_flag[:cap], r16t, tmax2, Wt, cb)
    return t_out.sum(), jnp.sum(n_active)


def rays(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    px = jax.random.uniform(k1, (B, 2)) * 24 - 12
    o = jnp.concatenate([px[:, :1], px[:, 1:], jnp.full((B, 1), -40.0)], 1)
    tgt = jnp.concatenate([px * 0.8, jnp.zeros((B, 1))], 1)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    r16 = pdense.ray_vectors(o, d, center)
    return r16, jnp.full((B,), 1e30, jnp.float32)


for mode in ["full", "dotonly", "nodot"]:
    r16, tmax = rays(0)
    s, na = run(r16, tmax, mode)
    jax.block_until_ready(s)
    t0 = time.time()
    for i in range(1, 9):
        r16, tmax = rays(i)
        s, na = run(r16, tmax, mode)
    jax.block_until_ready(s)
    dt = (time.time() - t0) / 8
    print(f"{mode:8s}: {dt*1e3:8.2f} ms  active pairs={int(na)} "
          f"(~{dt/max(int(na),1)*1e6:.1f} us/step)", flush=True)
