"""Kernel epilogue cost ladder: time dense_intersect variants with the
VPU epilogue progressively stripped, to find the optimization floor.

  v_full    : current production kernel
  v_nokey   : winner tracking via plain f32 min (no lane packing, no prim)
  v_not     : skip t entirely — just sign-test count (OR-reduce any-hit)
  v_matmul  : matmul + sum only (absolute floor)
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

from pbrt_tpu.models import flagship
from pbrt_tpu.ops import pallas_intersect as pd
from pbrt_tpu.ops import intersect as isect

scene, _ = flagship.cornell(tessellate=True)
CHUNK = pd.CHUNK
RAY_TILE = pd.RAY_TILE
LANE_MASK = pd.LANE_MASK
F32_MAX = pd.F32_MAX
B2 = 131072

lo = np.asarray(scene.world_lo); hi = np.asarray(scene.world_hi)
def ray_batch(seed, n):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.where(rng.uniform(size=n) < 0.7, 1e30, -1.0).astype(np.float32)
    return (jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax))
batches = [ray_batch(s, B2) for s in range(10)]

def timed(fn):
    jax.block_until_ready(fn(*batches[0]))
    t0 = time.time()
    out = [fn(*b) for b in batches[1:9]]
    jax.block_until_ready(out)
    return (time.time() - t0) / 8 * 1e3


def make_variant(body):
    """Clone of dense_intersect wired to a custom kernel body."""
    @partial(jax.jit, static_argnames=())
    def run(o, d, tmax):
        order = isect._coherence_order(scene, o, d, tmax)
        r16 = pd.ray_vectors(o, d, scene.dense_center)[order]
        tmax_s = tmax[order]
        n_tiles = B2 // RAY_TILE
        n_chunks = scene.dense_npad // CHUNK
        r16t = r16.reshape(n_tiles, RAY_TILE, 16)
        tmt = tmax_s.reshape(n_tiles, RAY_TILE)
        tm2 = tmax_s.reshape(n_tiles, 1, RAY_TILE)
        cl, na, _ = pd._tile_chunk_lists(r16t, tmt, scene.dense_cb)
        wt, wc, wf = pd._work_queue(cl, na, n_tiles, n_chunks)
        cap = n_tiles * n_chunks
        wt = jax.lax.slice(wt, (0,), (cap,))
        wc = jax.lax.slice(wc, (0,), (cap,))
        wf = jax.lax.slice(wf, (0,), (cap,))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3, grid=(cap,),
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
            body, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 1, RAY_TILE), jnp.int32),
            ])(wt, wc, wf, r16t, tm2, scene.dense_w, scene.dense_cb)
        return t_out.sum(), prim_out.sum()
    return run


def common_prefix(wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref, cb_ref,
                  t_ref, prim_ref, k):
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
    lo_ = cb_ref[c, 0:3]
    hi_ = cb_ref[c, 4:7]
    t0 = (lo_[None, :] - oc) * inv_d
    t1 = (hi_[None, :] - oc) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=1)
    box_hit = (tnear <= tfar * 1.0001 + 1e-5) & (tnear < t_best) & \
              (tfar > 0) & (t_best > 0)
    return c, flag, r, t_best, box_hit


def matmul48(r, w_ref):
    r_hi = r.astype(jnp.bfloat16)
    r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    r48 = jnp.concatenate([r_hi, r_lo, r_hi], axis=1)
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(r48, w_ref[:], dn,
                               preferred_element_type=jnp.float32)


def v_nokey(wq_tile_ref, wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref,
            w_ref, cb_ref, t_ref, prim_ref):
    k = pl.program_id(0)
    c, flag, r, t_best, box_hit = common_prefix(
        wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref, cb_ref, t_ref,
        prim_ref, k)

    @pl.when((flag > 0) & jnp.any(box_hit))
    def _():
        out = matmul48(r, w_ref)
        s1 = out[:, 0 * CHUNK:1 * CHUNK]
        s2 = out[:, 1 * CHUNK:2 * CHUNK]
        num = out[:, 2 * CHUNK:3 * CHUNK]
        nd = out[:, 3 * CHUNK:4 * CHUNK]
        s0 = nd - s1 - s2
        i0 = s0.view(jnp.int32); i1 = s1.view(jnp.int32)
        i2 = s2.view(jnp.int32)
        inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
        t = num * pl.reciprocal(nd, approx=True)
        tb = jnp.where(box_hit, t_best, -F32_MAX)
        hit = inside & (t > 1e-4) & (t < tb[:, None])
        tmin = jnp.min(jnp.where(hit, t, F32_MAX), axis=1)
        upd = tmin < F32_MAX
        t_ref[0, 0, :] = jnp.where(upd, tmin, t_best)
        prim_ref[0, 0, :] = jnp.where(upd, c, prim_ref[0, 0, :])


def v_not(wq_tile_ref, wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref,
          w_ref, cb_ref, t_ref, prim_ref):
    k = pl.program_id(0)
    c, flag, r, t_best, box_hit = common_prefix(
        wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref, cb_ref, t_ref,
        prim_ref, k)

    @pl.when((flag > 0) & jnp.any(box_hit))
    def _():
        out = matmul48(r, w_ref)
        s1 = out[:, 0 * CHUNK:1 * CHUNK]
        s2 = out[:, 1 * CHUNK:2 * CHUNK]
        nd = out[:, 3 * CHUNK:4 * CHUNK]
        s0 = nd - s1 - s2
        i0 = s0.view(jnp.int32); i1 = s1.view(jnp.int32)
        i2 = s2.view(jnp.int32)
        inside = ((i0 ^ i1) | (i0 ^ i2)) >= 0
        anyh = jnp.max(inside.astype(jnp.float32), axis=1)
        t_ref[0, 0, :] = jnp.minimum(t_best, jnp.where(anyh > 0, 1.0,
                                                       F32_MAX))
        prim_ref[0, 0, :] = jnp.where(anyh > 0, c, prim_ref[0, 0, :])


def v_matmul(wq_tile_ref, wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref,
             w_ref, cb_ref, t_ref, prim_ref):
    k = pl.program_id(0)
    c, flag, r, t_best, box_hit = common_prefix(
        wq_chunk_ref, wq_flag_ref, r16_ref, tmax_ref, cb_ref, t_ref,
        prim_ref, k)

    @pl.when((flag > 0) & jnp.any(box_hit))
    def _():
        out = matmul48(r, w_ref)
        red = jnp.min(out[:, 0:CHUNK], axis=1)
        t_ref[0, 0, :] = jnp.minimum(t_best, red)
        prim_ref[0, 0, :] = jnp.full_like(prim_ref[0, 0, :], 0)


@jax.jit
def v_full(o, d, tmax):
    order = isect._coherence_order(scene, o, d, tmax)
    r16 = pd.ray_vectors(o, d, scene.dense_center)[order]
    t, prim = pd.dense_intersect(r16, tmax[order], scene.dense_w,
                                 scene.dense_cb, scene.dense_npad)
    return t.sum(), prim.sum()

print(f"v_full   : {timed(v_full):7.2f} ms", flush=True)
print(f"v_nokey  : {timed(make_variant(v_nokey)):7.2f} ms", flush=True)
print(f"v_not    : {timed(make_variant(v_not)):7.2f} ms", flush=True)
print(f"v_matmul : {timed(make_variant(v_matmul)):7.2f} ms", flush=True)
